#!/bin/bash
# 5-step MLI-NeRF pipeline on NRHints-style real captures (point light per
# frame). Counterpart of the reference run_real.sh.
set -e

CONF_a="${CONF_a:-NRHints_Pikachu_a}"
CONF_b="${CONF_b:-NRHints_Pikachu_b}"

python train.py --logdir=logs/${CONF_a} --config=configs/${CONF_a}.yaml --show_pbar
python test.py --config=configs/${CONF_a}.yaml --logdir=logs/${CONF_a} \
    --inference_mode unpairlights_train --model.render.rand_rays_val=4096 --runtime.inference_chunks_per_dispatch=4
python -m mlinerf_tpu.pipelines.pseudo_label \
    --workdir logs/${CONF_a}/output_unpairlights_train --setting unpair
python train.py --logdir=logs/${CONF_b} --config=configs/${CONF_b}.yaml --show_pbar
python test.py --config=configs/${CONF_b}.yaml --logdir=logs/${CONF_b} --inference_mode image_test
