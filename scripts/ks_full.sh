#!/usr/bin/env bash
python main.py --ckpt_path ./results/ks/full_normal --modality full --dataset KineticSound --modulation Normal --alpha 0.8 --train
