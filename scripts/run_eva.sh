#!/usr/bin/env bash
# EVA preset (reference: SNAG_MMEA/run_eva.sh — epoch 2000, il_start 500)
python -m snag_tpu.cli.train_mmea \
    --gpu "${1:-0}" --eval_epoch 1 --model_name EVA \
    --data_choice "${2:-DBP15K}" --data_split "${3:-ja_en}" --data_rate "${4:-0.3}" \
    --epoch 2000 --lr 5e-4 --hidden_units "300,300,300" --batch_size 3500 \
    --semi_learn_step 5 --csls --csls_k 3 --random_seed "${5:-3408}" \
    --exp_name "EVA_${7:-1.0}" --exp_id "E_${7:-1.0}" --scheduler cos \
    --attr_dim 300 --img_dim 300 --name_dim 300 --char_dim 300 \
    --hidden_size 300 --structure_encoder gcn \
    --use_surface "${6:-0}" --ratio "${7:-1.0}" \
    --il --il_start 500 --enable_sota \
    --add_noise 1 --noise_ratio "${8:-0.2}" --mask_ratio "${9:-0.7}"
