#!/usr/bin/env bash
# CREMA-D DGL (reference cramed_dgl.sh recipe; historical top-1: alpha=4 -> 77.48, alpha=5 -> 78.12)
python main_dgl.py --ckpt_path ./results/cramed/full_auxi_unimodal_grad_decouple_fusion --modality full --dataset CREMAD --modulation Normal --alpha 4 --train --learning_rate 0.002
python main_dgl.py --ckpt_path ./results/cramed/full_auxi_unimodal_grad_decouple_fusion --modality full --dataset CREMAD --modulation Normal --alpha 5 --train --learning_rate 0.002
