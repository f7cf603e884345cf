#!/usr/bin/env bash
# SNAG preset (reference: SNAG_MMEA/run_snag.sh)
# usage: bash scripts/run_snag.sh GPU DATASET SPLIT RATE SEED SURFACE IMG_RATIO NOISE_RATIO MASK_RATIO
python -m snag_tpu.cli.train_mmea \
    --gpu "${1:-0}" --eval_epoch 1 --only_test 0 --model_name SNAG \
    --data_choice "${2:-DBP15K}" --data_split "${3:-ja_en}" --data_rate "${4:-0.3}" \
    --epoch 1500 --lr 5e-4 --hidden_units "300,300,300" --save_model 0 \
    --batch_size 3500 --semi_learn_step 5 --csls --csls_k 3 \
    --random_seed "${5:-3408}" \
    --exp_name "SNAG_NOISE_${7:-1.0}_NR_${8:-0.2}_MR_${9:-0.7}_v1" \
    --exp_id "${7:-1.0}_NR_${8:-0.2}_MR_${9:-0.7}" \
    --accumulation_steps 1 --scheduler cos \
    --attr_dim 300 --img_dim 300 --name_dim 300 --char_dim 300 \
    --hidden_size 300 --intermediate_size 400 --tau 0.1 --tau2 4.0 \
    --structure_encoder gat --num_attention_heads 1 --num_hidden_layers 1 \
    --use_surface "${6:-0}" --use_intermediate 1 --replay 0 --ratio "${7:-1.0}" \
    --il --il_start 250 --enable_sota \
    --add_noise 1 --noise_ratio "${8:-0.2}" --mask_ratio "${9:-0.7}"
