#!/usr/bin/env bash
# CREMA-D joint training sweeps (reference cramed.sh; historical top-1 annotated)
python main.py --ckpt_path ./results/cramed/full_normal --modality full --dataset CREMAD --modulation Normal --alpha 0.8 --train --num_frame 3 --pe 0 --beta 0 --gamma 0 --fusion_method film     # 57.5
python main.py --ckpt_path ./results/cramed/full_normal --modality full --dataset CREMAD --modulation Normal --alpha 0.8 --train --num_frame 3 --pe 1 --beta 1e-5 --gamma 2.5 --fusion_method sum    # 72.1
python main.py --ckpt_path ./results/cramed/full_normal --modality full --dataset CREMAD --modulation Normal --alpha 0.8 --train --num_frame 3 --pe 1 --beta 1e-5 --gamma 2.5 --fusion_method gated  # 75.7
python main.py --ckpt_path ./results/cramed/full_normal --modality full --dataset CREMAD --modulation Normal --alpha 0.8 --train --num_frame 3 --pe 1 --beta 1e-5 --gamma 2.5 --fusion_method film   # 66.1
