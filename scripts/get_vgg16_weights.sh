#!/bin/sh
# Fetch Frossard's Caffe-converted VGG16 weights (~528 MB), required for
# training and slow_style (the perceptual-loss feature tower).
# Counterpart of the reference's libs/get_vgg16_weights.sh.
set -e
DEST="${1:-libs}"
mkdir -p "$DEST"
echo "Downloading vgg16_weights.npz to $DEST/ ..."
curl -L -o "$DEST/vgg16_weights.npz" \
  "https://www.cs.toronto.edu/~frossard/vgg16/vgg16_weights.npz"
echo "Done. Pass --vgg_path $DEST/vgg16_weights.npz to train.py / slow_style.py"
