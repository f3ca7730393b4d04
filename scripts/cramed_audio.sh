#!/usr/bin/env bash
python main.py --train --ckpt_path results/cramed/audio --alpha 0.1 --modulation Normal --pe 0 --modality audio --gamma 0 --beta 0
