#!/bin/bash
# Reference training_script/evaluate_instance.sh equivalent.
python scripts/evaluate_instance.py \
    --m 64 --scale 50 --full_scale 4096 \
    --residual_blocks --use_dense_model --val_reps 3 \
    --checkpoint_file "${CHECKPOINT:-ckpts/instance_m64/step_latest}" "$@"
