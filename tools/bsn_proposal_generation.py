#!/usr/bin/env python
"""BSN stage-2: generate candidate proposals + BSP features from TEM
output CSVs (reference: tools/bsn_proposal_generation.py — multiprocess
peak-picking + feature interpolation).

Usage:
    python tools/bsn_proposal_generation.py CONFIG --mode train|test
"""

import argparse
import os
import os.path as osp
import sys
from multiprocessing import Manager, Process

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def dump_results(result_dict, out_dir, header):
    import numpy as np
    os.makedirs(out_dir, exist_ok=True)
    for video_name, result in result_dict.items():
        np.savetxt(osp.join(out_dir, video_name + '.csv'), result,
                   header=header, delimiter=',', comments='')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--mode', choices=['train', 'test'],
                        default='test')
    parser.add_argument('--num-workers', type=int, default=8)
    args = parser.parse_args()

    import json

    import numpy as np

    from vfs_tpu.localization.bsn_utils import (generate_bsp_feature,
                                                generate_candidate_proposals)
    from vfs_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    pgm_cfg = cfg.temporal_proposal_generation \
        if 'temporal_proposal_generation' in cfg else cfg.pgm_proposals_cfg
    # *_thread keys size the reference's worker pools, not the math
    feat_cfg = {k: v for k, v in dict(cfg.get('pgm_features_cfg', {})).items()
                if not k.endswith('_thread')}
    ann_file = cfg.data[args.mode].ann_file
    with open(ann_file) as f:
        anno = json.load(f)
    video_infos = []
    for name, info in anno.items():
        info['video_name'] = name
        video_infos.append(info)

    n = len(video_infos)
    workers = max(1, min(args.num_workers, n))
    chunks = np.array_split(np.arange(n), workers)
    manager = Manager()

    # stage 1: candidate proposals
    result_dict = manager.dict()
    jobs = [Process(target=generate_candidate_proposals,
                    args=(list(chunk), video_infos,
                          cfg.tem_results_dir,
                          pgm_cfg['temporal_scale'],
                          pgm_cfg['peak_threshold']),
                    kwargs=dict(result_dict=result_dict))
            for chunk in chunks]
    for j in jobs:
        j.start()
    for j in jobs:
        j.join()
    if any(j.exitcode != 0 for j in jobs):
        sys.exit('proposal-generation worker failed (see traceback above)')
    dump_results(dict(result_dict), cfg.pgm_proposals_dir,
                 'tmin,tmax,tmin_score,tmax_score,score,match_iou,'
                 'match_ioa')
    print(f'proposals written to {cfg.pgm_proposals_dir}')

    # stage 2: BSP features
    result_dict = manager.dict()
    jobs = [Process(target=generate_bsp_feature,
                    args=(list(chunk), video_infos, cfg.tem_results_dir,
                          cfg.pgm_proposals_dir),
                    kwargs=dict(result_dict=result_dict, **feat_cfg))
            for chunk in chunks]
    for j in jobs:
        j.start()
    for j in jobs:
        j.join()
    if any(j.exitcode != 0 for j in jobs):
        sys.exit('BSP-feature worker failed (see traceback above)')
    os.makedirs(cfg.pgm_features_dir, exist_ok=True)
    for video_name, feature in dict(result_dict).items():
        np.save(osp.join(cfg.pgm_features_dir, video_name + '.npy'),
                feature)
    print(f'BSP features written to {cfg.pgm_features_dir}')


if __name__ == '__main__':
    main()
