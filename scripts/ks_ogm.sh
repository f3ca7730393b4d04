#!/usr/bin/env bash
# KS joint + PE sweeps (reference ks_ogm.sh; historical top-1: gamma 1.0 -> 72.2, 2.0 -> 74.4, 2.5 -> 74.0)
python main.py --ckpt_path ./results/ks/full_normal --modality full --dataset KineticSound --modulation Normal --alpha 0.8 --train --num_frame 3 --pe 1 --beta 1e-5 --drop 0 --gamma 1.0
python main.py --ckpt_path ./results/ks/full_normal --modality full --dataset KineticSound --modulation Normal --alpha 0.8 --train --num_frame 3 --pe 1 --beta 1e-5 --drop 0 --gamma 2.0
python main.py --ckpt_path ./results/ks/full_normal --modality full --dataset KineticSound --modulation Normal --alpha 0.8 --train --num_frame 3 --pe 1 --beta 1e-5 --drop 0 --gamma 2.5
