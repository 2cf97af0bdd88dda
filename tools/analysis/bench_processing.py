#!/usr/bin/env python
"""Data-pipeline throughput benchmark (reference:
tools/analysis/bench_processing.py — times the host decode+augment
pipeline independent of the accelerator).

Usage:
    python tools/analysis/bench_processing.py CONFIG [--num-samples 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--num-samples', type=int, default=50)
    parser.add_argument('--split', default='train',
                        choices=['train', 'val', 'test'])
    args = parser.parse_args()

    from vfs_tpu.datasets import build_dataset
    from vfs_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data[args.split])
    n = min(args.num_samples, len(dataset))
    t0 = time.time()
    for i in range(n):
        sample = dataset[i % len(dataset)]
        _ = sample['imgs']
    dt = time.time() - t0
    print(f'{n} samples in {dt:.2f}s => {n / dt:.2f} samples/s '
          f'({dt / n * 1000:.1f} ms/sample)')


if __name__ == '__main__':
    main()
