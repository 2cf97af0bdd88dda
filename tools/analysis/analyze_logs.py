#!/usr/bin/env python
"""Analyze training JSONL logs (reference: tools/analysis/analyze_logs.py —
plot curves / compute average iteration time from TextLoggerHook json logs;
our logs are the JSONL written by vfs_tpu.apis.train).

Usage:
    python tools/analysis/analyze_logs.py cal_train_time LOG [LOG...]
    python tools/analysis/analyze_logs.py plot_curve LOG --keys loss \
        --out curve.png
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def load_jsonl(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def cal_train_time(args):
    import numpy as np
    for path in args.logs:
        records = [r for r in load_jsonl(path)
                   if r.get('mode') == 'train' and 'time' in r]
        times = np.array([r['time'] for r in records])
        if len(times) == 0:
            print(f'{path}: no train records')
            continue
        print(f'{path}: avg iter time {times.mean():.4f}s '
              f'(fastest {times.min():.4f}, slowest {times.max():.4f})')


def plot_curve(args):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for path in args.logs:
        records = [r for r in load_jsonl(path) if r.get('mode') == 'train']
        for key in args.keys:
            xs = list(range(len(records)))
            ys = [r.get(key) for r in records]
            plt.plot(xs, ys, label=f'{os.path.basename(path)}:{key}')
    plt.xlabel('log step')
    plt.legend()
    plt.savefig(args.out)
    print(f'saved {args.out}')


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest='task', required=True)
    p1 = sub.add_parser('cal_train_time')
    p1.add_argument('logs', nargs='+')
    p2 = sub.add_parser('plot_curve')
    p2.add_argument('logs', nargs='+')
    p2.add_argument('--keys', nargs='+', default=['loss'])
    p2.add_argument('--out', default='curve.png')
    args = parser.parse_args()
    if args.task == 'cal_train_time':
        cal_train_time(args)
    else:
        plot_curve(args)


if __name__ == '__main__':
    main()
