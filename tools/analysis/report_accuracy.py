#!/usr/bin/env python
"""Score-fusion accuracy report (reference:
tools/analysis/report_accuracy.py — weighted fusion of multiple models'
prediction score files).

Usage:
    python tools/analysis/report_accuracy.py --scores a.npz b.npz \
        --coefficients 1.0 1.0 --annotation list.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--scores', nargs='+', required=True,
                        help='npz/npy score files (num_samples x classes)')
    parser.add_argument('--coefficients', nargs='+', type=float,
                        required=True)
    parser.add_argument('--annotation', required=True,
                        help='label list: one "path label" per line')
    args = parser.parse_args()

    import numpy as np

    from vfs_tpu.core.evaluation import (get_weighted_score,
                                         mean_class_accuracy,
                                         top_k_accuracy)

    score_list = []
    for path in args.scores:
        data = np.load(path, allow_pickle=True)
        if hasattr(data, 'files'):
            data = np.stack([data[f] for f in data.files])
        score_list.append(list(data))
    labels = []
    with open(args.annotation) as f:
        for line in f:
            parts = line.strip().split()
            if parts:
                labels.append(int(parts[-1]))
    weighted = get_weighted_score(score_list, args.coefficients)
    top1, top5 = top_k_accuracy(weighted, labels, (1, 5))
    mca = mean_class_accuracy(weighted, labels)
    print(f'top1: {top1:.4f} top5: {top5:.4f} mean_class_acc: {mca:.4f}')


if __name__ == '__main__':
    main()
