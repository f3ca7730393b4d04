#!/usr/bin/env bash
python main.py --ckpt_path ./results/ks/audio --modality audio --dataset KineticSound --modulation Normal --alpha 0.8 --train
