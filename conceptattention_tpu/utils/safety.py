"""NSFW screening for generated images.

Capability parity with the reference CLI's classifier gate
(`flux/src/flux/cli.py:17,132,231-243` in manuragkhullar/ConceptAttention:
a `Falconsai/nsfw_image_detection` HF pipeline scored against
NSFW_THRESHOLD=0.85 before saving). The HF checkpoint needs network access,
so the classifier is availability-gated like `HFTextEncoders`: when the
weights can't load, `nsfw_score` returns 0.0 and records why — callers keep
the same control flow either way.
"""

from __future__ import annotations

from typing import Optional

NSFW_THRESHOLD = 0.85  # reference flux/src/flux/cli.py:17

_classifier = None
_unavailable_reason: Optional[str] = None


def classifier_available() -> bool:
    """True when the HF image-classification pipeline could be constructed."""
    return _load() is not None


def _load():
    global _classifier, _unavailable_reason
    if _classifier is not None or _unavailable_reason is not None:
        return _classifier
    try:
        import os

        from huggingface_hub import constants as hf_constants  # noqa: PLC0415

        cached = os.path.isdir(
            os.path.join(
                hf_constants.HF_HUB_CACHE,
                "models--Falconsai--nsfw_image_detection",
            )
        )
        # huggingface_hub truthiness: only 1/ON/YES/TRUE mean offline.
        offline = (
            os.environ.get("HF_HUB_OFFLINE", "").upper()
            in ("1", "ON", "YES", "TRUE")
        )
        if not cached and offline:
            # Standard hub semantics: HF_HUB_OFFLINE=1 means no network.
            # Skip the hub's multi-minute retry loop when the checkpoint
            # isn't already cached locally; online environments (the
            # default, unset) attempt the download normally.
            raise FileNotFoundError(
                "Falconsai/nsfw_image_detection not in the local HF cache "
                "and HF_HUB_OFFLINE is set"
            )
        from transformers import pipeline  # noqa: PLC0415

        _classifier = pipeline(
            "image-classification", model="Falconsai/nsfw_image_detection"
        )
    except Exception as e:  # offline / package or weights missing
        _unavailable_reason = f"{type(e).__name__}: {e}"
        _classifier = None
    return _classifier


def nsfw_score(image) -> float:
    """NSFW probability of a PIL image in [0, 1].

    Returns 0.0 (permissive, with the reason recorded in
    `unavailable_reason()`) when the classifier checkpoint is unavailable —
    matching the reference's behavior minus the hard dependency.
    """
    clf = _load()
    if clf is None:
        return 0.0
    scores = clf(image)
    for entry in scores:
        if entry.get("label") == "nsfw":
            return float(entry["score"])
    return 0.0


def unavailable_reason() -> Optional[str]:
    _load()
    return _unavailable_reason


def is_safe(image, threshold: float = NSFW_THRESHOLD) -> bool:
    return nsfw_score(image) < threshold
