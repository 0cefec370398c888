#!/usr/bin/env bash
# Baseline-zoo runs over the ImageNet-Segmentation harness — parity with the
# reference's per-baseline sweeps (run_chefer_baselines.sh, run_dino.sh,
# run_daam_sd2.sh, run_daam_sdxl.sh, run_text_span.sh). Checkpoints load from
# env vars (CHEFER_VITB16 / DINO_VITB16 / SD2_UNET / SDXL_UNET /
# OPENCLIP_VITH14 — see conceptattention_tpu/evals/model_zoo.py).
set -euo pipefail

MAT_PATH=${MAT_PATH:-/data/gtsegs_ijcv.mat}
N=${N:-100}
RUN="python experiments/imagenet_segmentation/run_experiment.py --mat_path $MAT_PATH --num_images $N --segmentation_model"

for m in CheferLRP CheferRollout CheferLastLayerAttention \
         CheferAttentionGradCAM CheferTransformerAttribution \
         CheferFullLRP CheferLastLayerLRP; do
  $RUN "$m"
done
$RUN DINO
$RUN DAAMSD2
$RUN DAAMSDXL
$RUN TextSpan
