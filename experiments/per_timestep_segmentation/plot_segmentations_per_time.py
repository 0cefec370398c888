"""Plot the per-timestep sweep CSV as a metric-vs-noise-timestep line chart.

Parity target: the per-timestep plot companion in the reference
(manuragkhullar/ConceptAttention, `experiments/per_timestep_segmentation/`).

Usage:
    python plot_segmentations_per_time.py --csv per_timestep_metrics.csv \
        --out per_timestep_metrics.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from conceptattention_tpu.utils.sweep_plots import plot_sweep_csv  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", default="per_timestep_metrics.csv")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    out = args.out or os.path.splitext(args.csv)[0] + ".png"
    print("wrote", plot_sweep_csv(args.csv, out, x_col="timestep",
                                  title="Noise Timestep vs Segmentation Performance"))
