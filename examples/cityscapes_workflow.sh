#!/usr/bin/env bash
# Full real-data workflow (requires a Cityscapes checkout + the public
# DRN-C-26 checkpoint drn_c_26-ddedf421.pth).  Mirrors the reference
# repo's README steps 1-7 end to end.
set -euo pipefail

CITYSCAPES=${CITYSCAPES:-data/cityscapes}
PTH=${PTH:-drn_c_26-ddedf421.pth}

# 1. convert the pretrained DRN (one-time; includes a numeric parity check)
python -m spalign_tpu.cli.convert_model "$PTH" models/drn_c_26.pytree \
    --model drn_c_26 --check

# 2. package the dataset as store-only zips for fast random access
python -m spalign_tpu.cli.make_zips filelist \
    spalign_tpu/data/filelists/train_images.txt data/train_imgs.0.zip
python -m spalign_tpu.cli.make_zips dir \
    "$CITYSCAPES/leftImg8bit/val/*/*.png" data/val_imgs.0.zip
python -m spalign_tpu.cli.make_zips dir \
    "$CITYSCAPES/gtFine/val/*/*labelIds.png" data/val_labels.0.zip

# 3. sanity lower bound
python -m spalign_tpu.cli.bottom_half \
    --cityscapes_img_zip data/val_imgs.0.zip \
    --cityscapes_label_zip data/val_labels.0.zip

# 4. generate pseudo-labels (the paper's headline config) for the
#    random-300 eval subset, then the full train split
python -m spalign_tpu.cli.label_gen \
    --img_file_list spalign_tpu/data/filelists/random300_images.txt \
    --label_file_list spalign_tpu/data/filelists/random300_labels.txt \
    --weights models/drn_c_26.pytree \
    --superpixel_method felzenszwalb --out_dir results/random300
python -m spalign_tpu.cli.mean_result results/random300/result.json

python -m spalign_tpu.cli.label_gen \
    --img_file_list spalign_tpu/data/filelists/train_images.txt \
    --label_file_list spalign_tpu/data/filelists/train_labels.txt \
    --weights models/drn_c_26.pytree \
    --superpixel_method felzenszwalb --out_dir results/train_labels

# 5. train SegNetBasic on the estimated labels (README recipe)
python -m spalign_tpu.cli.train \
    --train_img_zip data/train_imgs.0.zip \
    --train_label_zip results/train_labels \
    --val_img_zip data/val_imgs.0.zip \
    --val_label_zip data/val_labels.0.zip \
    --model basic --optimizer Adam --batchsize 8 --train_limit 2000 \
    --input_shape 512 1024 --prefix results/train

# 6. multi-round self-training with soft labels
python -m spalign_tpu.cli.rounds --n_round 3 --use_soft_label \
    --img_zip data/train_imgs.0.zip --label_zip data/train_labels.0.zip \
    --estimated_label_zip results/train_labels \
    --val_img_zip data/val_imgs.0.zip --val_label_zip data/val_labels.0.zip

# 7. report across rounds + demo video
python -m spalign_tpu.cli.make_table results --plot
# python -m spalign_tpu.cli.demo_video --param_dir results/train_round3 \
#     --frames_dir "$CITYSCAPES/leftImg8bit/demoVideo/stuttgart_00" \
#     --out_dir results/demo
