from conceptattention_tpu.models.text.encoders import (
    StubTextEncoders,
    TextEncoders,
    embed_concepts,
)

__all__ = ["TextEncoders", "StubTextEncoders", "embed_concepts"]
