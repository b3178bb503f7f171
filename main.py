#!/usr/bin/env python
"""Entry point with the reference CLI surface (ref: main.py).

    python main.py --model Multimodality_Mamba --dataset Houston2013 \
        --train_set .../TRLabel.mat --test_set .../TSLabel.mat \
        --flip_augmentation --runs 10
"""

from vit_cnn_tpu.cli import main

if __name__ == "__main__":
    main()
