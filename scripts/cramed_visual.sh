#!/usr/bin/env bash
python main.py --train --ckpt_path results/cramed/visual --alpha 0.1 --modulation Normal --pe 0 --modality visual --beta 0 --learning_rate 0.001
