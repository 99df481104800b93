#!/bin/bash
# Canonical OccuSeg training hyperparameters (reference
# training_script/train_instance.sh: batch 5, Adam 1e-3, gamma 1e-2 @ 200
# epochs, m=64, scale 50 = 2cm voxels, residual blocks, rotation noise,
# RGB features, val_reps 3).
python scripts/train_instance.py \
    --m 64 --batch_size 5 --scale 50 --full_scale 4096 \
    --residual_blocks --block_reps 1 \
    --use_rotation_noise --use_feature c --val_reps 3 \
    --use_dense_model \
    --lr 1e-3 --gamma 1e-2 --step_size 48000 \
    --taskname instance_m64 "$@"
