#!/usr/bin/env bash
# Ablation sweeps over the ImageNet-Segmentation harness.
# Parity with the reference's shell sweeps (run_raw_space_ablation.sh,
# run_cross_self_ablation.sh, run_softmax_test.sh, ... in
# experiments/imagenet_segmentation/ of manuragkhullar/ConceptAttention):
# representation-space, normalization, and blur ablations are flags here.
set -euo pipefail

MAT_PATH=${MAT_PATH:-/data/gtsegs_ijcv.mat}
N=${N:-100}
RUN="python experiments/imagenet_segmentation/run_experiment.py --mat_path $MAT_PATH --num_images $N"

# Representation-space ablation (raw output / cross-attention / value space)
$RUN --tap output
$RUN --tap cross_attention
$RUN --tap value

# Softmax-normalization ablation
$RUN --tap output --softmax

# Blur ablation
$RUN --tap output --apply_blur

# Layer-range ablation
$RUN --tap output --layers 0 1 2 3
$RUN --tap output --layers 14 15 16 17

# Cross/self concept-attention ablation (reference run_cross_self_ablation.sh)
$RUN --tap output --no-concept_self_attention
$RUN --tap output --no-concept_cross_attention --concept_self_attention

# "Chefer-fair" 14x14 downscale test (reference run_downscale_test.sh)
$RUN --tap output --downscale 14
