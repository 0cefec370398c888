"""Extract concept heatmaps from a real image.

Parity target: `example_encoded_image.py:1-29` in the reference
(manuragkhullar/ConceptAttention).
"""

import os as _os
import sys as _sys

# Allow running as a plain script from anywhere: put the repo root (one
# level up) on sys.path so `conceptattention_tpu` imports without install.
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)


import sys

import PIL.Image

from conceptattention_tpu import ConceptAttentionFluxPipeline


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else "generated_image.png"
    image = PIL.Image.open(image_path).convert("RGB")
    pipeline = ConceptAttentionFluxPipeline(model_name="flux-schnell")
    concepts = ["dragon", "rock", "sky", "cloud"]
    out = pipeline.encode_image(
        image=image,
        concepts=concepts,
        prompt="A dragon standing on a rock",
        width=1024,
        height=1024,
        num_samples=4,
    )
    for concept, heatmap in zip(concepts, out.concept_heatmaps):
        heatmap.save(f"encoded_{concept}_heatmap.png")
    print("wrote per-concept heatmaps for", image_path)


if __name__ == "__main__":
    main()
