#!/bin/bash
# 5-step MLI-NeRF pipeline on a ReNe scene (grid of cameras x lights).
# Counterpart of the reference run_rene.sh. Uses paired (cam,light) renders
# for the pseudo-label step.
set -e

CONF_a="${CONF_a:-rene_savannah_a}"
CONF_b="${CONF_b:-rene_savannah_b}"

python train.py --logdir=logs/${CONF_a} --config=configs/${CONF_a}.yaml --show_pbar
python test.py --config=configs/${CONF_a}.yaml --logdir=logs/${CONF_a} \
    --inference_mode lights_train --model.render.rand_rays_val=4096 --runtime.inference_chunks_per_dispatch=4
python -m mlinerf_tpu.pipelines.pseudo_label \
    --workdir logs/${CONF_a}/output_lights_train --setting pair
python train.py --logdir=logs/${CONF_b} --config=configs/${CONF_b}.yaml --show_pbar
python test.py --config=configs/${CONF_b}.yaml --logdir=logs/${CONF_b} \
    --inference_mode image_test --anno test_custom_transforms.json
python test.py --config=configs/${CONF_b}.yaml --logdir=logs/${CONF_b} --inference_mode video_train_0_67
