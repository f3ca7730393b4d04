#!/usr/bin/env bash
python main.py --ckpt_path ./results/ks/visual --modality visual --dataset KineticSound --modulation Normal --alpha 0.8 --train --num_frame 3
