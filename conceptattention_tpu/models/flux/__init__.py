from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.models.flux.dit import flux_forward

__all__ = ["init_flux_params", "flux_forward"]
