"""Generate an image and save per-concept heatmaps.

Parity target: `example_generated_image.py:1-31` in the reference
(manuragkhullar/ConceptAttention).
"""

import os as _os
import sys as _sys

# Allow running as a plain script from anywhere: put the repo root (one
# level up) on sys.path so `conceptattention_tpu` imports without install.
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)


from conceptattention_tpu import ConceptAttentionFluxPipeline


def main():
    pipeline = ConceptAttentionFluxPipeline(model_name="flux-schnell")
    prompt = "A dragon standing on a rock"
    concepts = ["dragon", "rock", "sky", "cloud"]
    out = pipeline.generate_image(
        prompt=prompt,
        concepts=concepts,
        width=1024,
        height=1024,
        seed=0,
        num_inference_steps=4,
    )
    out.image.save("generated_image.png")
    for concept, heatmap in zip(concepts, out.concept_heatmaps):
        heatmap.save(f"{concept}_heatmap.png")
    print("wrote generated_image.png and per-concept heatmaps")


if __name__ == "__main__":
    main()
