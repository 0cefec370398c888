"""Shared helper: make /root/reference importable by stubbing the external
packages this image lacks (entmax, torchvision, fire, imwatermark).

The entmax stub carries EXACT sort-based torch sparsemax / 1.5-entmax
implementations (Martins & Astudillo 2016 eq. 8; Peters et al. 2019 alg. 2),
written independently of both the entmax package and our JAX ops/sparse.py,
so heatmap parity tests remain meaningful.
"""

import importlib.machinery
import sys
import types

import torch

REFERENCE = "/root/reference"


def torch_sparsemax(x: torch.Tensor, dim: int = -1) -> torch.Tensor:
    x = x.transpose(dim, -1)
    z, _ = torch.sort(x, dim=-1, descending=True)
    k = torch.arange(1, x.shape[-1] + 1, dtype=x.dtype, device=x.device)
    cum = torch.cumsum(z, dim=-1)
    support = 1 + k * z > cum
    k_max = support.sum(dim=-1, keepdim=True).to(x.dtype)
    tau = (torch.gather(cum, -1, support.sum(-1, keepdim=True) - 1) - 1) / k_max
    return torch.clamp(x - tau, min=0).transpose(dim, -1)


def torch_entmax15(x: torch.Tensor, dim: int = -1) -> torch.Tensor:
    x = x.transpose(dim, -1) / 2.0
    z, _ = torch.sort(x, dim=-1, descending=True)
    k = torch.arange(1, x.shape[-1] + 1, dtype=x.dtype, device=x.device)
    mean = torch.cumsum(z, dim=-1) / k
    mean_sq = torch.cumsum(z**2, dim=-1) / k
    delta = (1.0 - k * (mean_sq - mean**2)) / k
    delta = torch.clamp(delta, min=0)
    tau = mean - torch.sqrt(delta)
    support = (tau <= z).sum(dim=-1, keepdim=True)
    tau_star = torch.gather(tau, -1, support - 1)
    return (torch.clamp(x - tau_star, min=0) ** 2).transpose(dim, -1)


def install_reference():
    """Stub missing deps and put /root/reference on sys.path."""

    def stub(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    ent = stub("entmax")
    ent.sparsemax = torch_sparsemax
    ent.entmax15 = torch_entmax15
    tv = stub("torchvision")
    tvt = stub("torchvision.transforms")
    tvf = stub("torchvision.transforms.functional")
    tv.transforms = tvt
    tvt.functional = tvf
    tvo = stub("torchvision.ops")
    tvom = stub("torchvision.ops.misc")
    tv.ops = tvo
    tvo.misc = tvom
    # clip_text_span/utils/misc.py imports this at module scope; the reference
    # only calls it for ResNet towers, which the parity tests never build.
    tvom.FrozenBatchNorm2d = torch.nn.BatchNorm2d
    # clip_text_span/utils/transform.py module-scope imports (only used for
    # image preprocessing pipelines the parity tests never run).
    for _name in ("Normalize", "RandomResizedCrop",
                  "Resize", "CenterCrop", "ToPILImage", "InterpolationMode"):
        setattr(tvt, _name, type(_name, (), {
            "__init__": lambda self, *a, **k: None,
            "__call__": lambda self, x=None, *a, **k: x,
            "__getattr__": lambda self, n: None,
            "BICUBIC": "bicubic",  # InterpolationMode enum stand-in
        }))

    # Functional stand-ins the segmentation-protocol parity test drives for
    # real (reference segmentation.py: Compose/Lambda/ToTensor in
    # encode_image, F.gaussian_blur in SegmentationAbstractClass.__call__).
    # Semantics match torchvision's implementations.
    class _Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class _Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class _ToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, pic):
            # torchvision semantics: PIL/uint8 HWC -> float CHW in [0, 1];
            # float ndarray -> CHW tensor unscaled.
            import numpy as np

            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy()).contiguous()
            if t.dtype == torch.uint8:
                return t.float() / 255.0
            return t.float()

    tvt.Compose = _Compose
    tvt.Lambda = _Lambda
    tvt.ToTensor = _ToTensor

    def _gaussian_blur(img, kernel_size, sigma):
        """torchvision.transforms.functional.gaussian_blur: separable
        gaussian (linspace kernel, normalized), reflect padding, per-channel
        conv2d over the trailing two dims."""
        ks = ([kernel_size, kernel_size] if isinstance(kernel_size, int)
              else list(kernel_size))
        sig = [float(sigma), float(sigma)] if isinstance(
            sigma, (int, float)) else [float(s) for s in sigma]

        def kernel1d(k, s):
            half = (k - 1) * 0.5
            x = torch.linspace(-half, half, steps=k)
            pdf = torch.exp(-0.5 * (x / s).pow(2))
            return pdf / pdf.sum()

        kx = kernel1d(ks[0], sig[0]).to(img.dtype)
        ky = kernel1d(ks[1], sig[1]).to(img.dtype)
        kernel2d = torch.mm(ky[:, None], kx[None, :])
        shape = img.shape
        x = img.reshape(-1, 1, shape[-2], shape[-1])
        pad = [ks[0] // 2, ks[0] // 2, ks[1] // 2, ks[1] // 2]
        x = torch.nn.functional.pad(x, pad, mode="reflect")
        x = torch.nn.functional.conv2d(x, kernel2d[None, None])
        return x.reshape(shape)

    tvf.gaussian_blur = _gaussian_blur
    # clip_text_span/utils/tokenizer.py needs `ftfy` and `regex` at module
    # scope (the BPE tokenizer itself is never constructed by the parity
    # tests). The stubs must NOT stay in sys.modules — transformers' lazy
    # import machinery does `import regex` and breaks on a bare stub — so the
    # module is loaded directly from its FILE with transient stubs and
    # registered under its dotted name for later package imports to reuse.
    import importlib.util as _ilu
    import re as _re

    dotted = ("concept_attention.binary_segmentation_baselines."
              "clip_text_span.utils.tokenizer")
    tok_path = (f"{REFERENCE}/concept_attention/binary_segmentation_baselines/"
                "clip_text_span/utils/tokenizer.py")
    if dotted not in sys.modules:
        transient = {}
        for name in ("ftfy", "regex"):
            if name not in sys.modules:
                m = types.ModuleType(name)
                m.__spec__ = importlib.machinery.ModuleSpec(name, None)
                transient[name] = m
        if "ftfy" in transient:
            transient["ftfy"].fix_text = lambda s: s
        if "regex" in transient:
            # tokenizer.py builds a module-level SimpleTokenizer whose \p{L}
            # patterns stdlib `re` cannot compile — a None pattern is fine
            # because the parity tests never tokenize through it.
            transient["regex"].compile = lambda *a, **k: None
            transient["regex"].findall = lambda *a, **k: []
            transient["regex"].IGNORECASE = _re.IGNORECASE
        sys.modules.update(transient)
        try:
            spec = _ilu.spec_from_file_location(dotted, tok_path)
            mod = _ilu.module_from_spec(spec)
            sys.modules[dotted] = mod
            spec.loader.exec_module(mod)
        except Exception:
            sys.modules.pop(dotted, None)  # tests needing it surface the error
        finally:
            for name in transient:
                sys.modules.pop(name, None)
    fire = stub("fire")  # CLI-only dep pulled in via flux.cli import chain
    fire.Fire = lambda *a, **k: None
    iw = stub("imwatermark")
    iw.WatermarkEncoder = type(
        "WatermarkEncoder", (),
        {"__getattr__": lambda self, name: (lambda *a, **k: None)},
    )
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
