#!/usr/bin/env bash
# MKGC base script (reference contract: SNAG_MKGC/readme.md:13-14)
# usage: bash scripts/run_base.sh GPU DATA num_proj use_intermediate joint_way \
#        noise_ratio mask_ratio noise_level num_hidden_layers num_attention_heads EXP_ID
EMB_DIM=128; NUM_BATCH=1024; MARGIN=12; LR=1e-4; LRG=1e-4; NEG_NUM=32
EPOCH=8000; NOISE=1; POOL=1
python -m snag_tpu.cli.train_mkgc \
    --gpu "${1:-0}" --data_choice "${2:-DB15K}" --num_proj "${3:-1}" \
    --use_intermediate "${4:-0}" --joint_way "${5:-Mformer_hd_mean}" \
    --noise_ratio "${6:-0.2}" --mask_ratio "${7:-0.7}" --noise_update "${8:-epoch}" \
    --num_hidden_layers "${9:-1}" --num_attention_heads "${10:-2}" \
    --exp_id "${11:-K001}" \
    --emb_dim $EMB_DIM --num_batch $NUM_BATCH --margin $MARGIN \
    --lr $LR --lrg $LRG --neg_num $NEG_NUM --epoch $EPOCH \
    --add_noise $NOISE --use_pool $POOL
