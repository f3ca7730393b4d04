#!/usr/bin/env bash
python main_dgl.py --ckpt_path ./results/vgg --modality full --dataset VGGSound --modulation Normal --alpha 2.0 --train --num_frame 3 --learning_rate 2e-3
