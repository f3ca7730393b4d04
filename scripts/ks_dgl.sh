#!/usr/bin/env bash
# Kinetics-Sounds DGL (reference ks_dgl.sh; historical top-1: alpha=2 -> 74.78, alpha=3 -> 75.10/76.28)
python main_dgl.py --ckpt_path ./results/ks/full_normal --modality full --dataset KineticSound --modulation Normal --alpha 2 --train --num_frame 3 --learning_rate 0.002
python main_dgl.py --ckpt_path ./results/ks/full_normal --modality full --dataset KineticSound --modulation Normal --alpha 3 --train --num_frame 3 --learning_rate 0.002
