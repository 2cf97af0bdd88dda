"""Annotation-split parsing for the standard video benchmarks.

Library behind ``build_file_list.py`` (reference:
tools/data/parse_file_list.py:1-517 — re-designed here: every parser takes
an explicit ``data_root`` instead of assuming the CWD, and the parsers are
looked up through one registry so new datasets are one function + one
decorator).

Each parser returns ``splits``: a list with one entry per official split
(UCF101/HMDB51 have 3, the rest 1); each entry is a tuple of subsets
(train, val[, test]); each subset is a list of ``(video_id, label)`` where
``label`` is an int, a list of ints (multi-label, e.g. MMiT), or -1 when
unknown (test subsets).
"""

import csv
import fnmatch
import glob
import json
import os
import os.path as osp

SPLIT_PARSERS = {}


def register_parser(name):
    def deco(fn):
        SPLIT_PARSERS[name] = fn
        return fn
    return deco


def parse_directory(path, rgb_prefix='img_', flow_x_prefix='flow_x_',
                    flow_y_prefix='flow_y_', level=1):
    """Scan a rawframes tree: ``{video_id: (dir, num_rgb, num_flow)}``.

    Reference parse_file_list.py:10-82 semantics (counts files by prefix;
    level 1 = flat dirs, level 2 = class/video dirs; raises when the x/y
    flow counts disagree).
    """
    assert level in (1, 2), 'level must be 1 or 2'
    pattern = osp.join(path, *(['*'] * level))
    info = {}
    for frame_dir in sorted(glob.glob(pattern)):
        if not osp.isdir(frame_dir):
            continue
        names = os.listdir(frame_dir)
        n_rgb = len(fnmatch.filter(names, rgb_prefix + '*'))
        n_x = len(fnmatch.filter(names, flow_x_prefix + '*'))
        n_y = len(fnmatch.filter(names, flow_y_prefix + '*'))
        if n_x != n_y:
            raise ValueError(
                f'flow x/y counts differ ({n_x} vs {n_y}) in {frame_dir}')
        vid = osp.relpath(frame_dir, path)
        info[vid] = (frame_dir, n_rgb, n_x)
    return info


def scan_videos(path, level=2):
    """Scan a videos tree: ``{video_id: (relative_path, -1, -1)}``."""
    pattern = osp.join(path, *(['*'] * level))
    info = {}
    for video in sorted(glob.glob(pattern)):
        if osp.isdir(video):
            continue
        rel = osp.relpath(video, path)
        info[osp.splitext(rel)[0]] = (rel, -1, -1)
    return info


def _strip_to_level(vid, level):
    vid = osp.splitext(vid)[0]
    parts = vid.split('/')
    return '/'.join(parts[-level:])


@register_parser('ucf101')
def parse_ucf101_splits(data_root, level=2):
    """UCF-101: 3 official splits from trainlist0{1..3}/testlist0{1..3} +
    classInd.txt (ids are 1-based in the file, 0-based in the list)."""
    ann = osp.join(data_root, 'annotations')
    with open(osp.join(ann, 'classInd.txt')) as f:
        class_map = {name: int(idx) - 1
                     for idx, name in (ln.split() for ln in f if ln.strip())}

    def to_item(line):
        # the class name is always the path's dirname, whatever the
        # output level — the label must be a class id in both layouts
        path = line.strip().split()[0]
        vid = _strip_to_level(path, level)
        label = class_map[path.split('/')[0]]
        return vid, label

    splits = []
    for i in (1, 2, 3):
        with open(osp.join(ann, f'trainlist{i:02d}.txt')) as f:
            train = [to_item(ln) for ln in f if ln.strip()]
        with open(osp.join(ann, f'testlist{i:02d}.txt')) as f:
            test = [to_item(ln) for ln in f if ln.strip()]
        splits.append((train, test))
    return splits


@register_parser('hmdb51')
def parse_hmdb51_splits(data_root, level=2):
    """HMDB-51: 3 splits derived from the per-class ``*_test_split{i}.txt``
    marker files (1=train, 2=test, 0=unused); classes are the sorted class
    dir names (reference parse_file_list.py:385-447)."""
    ann = osp.join(data_root, 'annotations')
    markers = sorted(glob.glob(osp.join(ann, '*_test_split1.txt')))
    classes = sorted(m[len(osp.join(ann, '')):-len('_test_split1.txt')]
                     for m in markers)
    class_map = {c: i for i, c in enumerate(classes)}

    splits = []
    for i in (1, 2, 3):
        train, test = [], []
        for cls in classes:
            with open(osp.join(ann, f'{cls}_test_split{i}.txt')) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) < 2:
                        continue
                    vid = _strip_to_level(f'{cls}/{parts[0]}', level)
                    item = (vid, class_map[cls])
                    if parts[1] == '1':
                        train.append(item)
                    elif parts[1] == '2':
                        test.append(item)
        splits.append((train, test))
    return splits


def _kinetics_label(s, keep_ws=False):
    s = s.replace('"', '')
    return s if keep_ws else s.replace(' ', '_')


@register_parser('kinetics400')
def parse_kinetics_splits(data_root, level=1):
    """Kinetics-400 csv annotations: label,youtube_id,start,end,... with a
    header row; video ids are ``{yid}_{start:06d}_{end:06d}`` (reference
    parse_file_list.py:257-312)."""
    ann = osp.join(data_root, 'annotations')

    def read(name, test=False):
        with open(osp.join(ann, name)) as f:
            rows = list(csv.reader(f))[1:]
        items = []
        for row in rows:
            if test:
                vid = f'{row[1]}_{int(float(row[2])):06d}' \
                      f'_{int(float(row[3])):06d}'
                items.append((vid, -1))
            else:
                vid = f'{row[1]}_{int(float(row[2])):06d}' \
                      f'_{int(float(row[3])):06d}'
                if level == 2:
                    vid = f'{_kinetics_label(row[0])}/{vid}'
                items.append((vid, class_map[_kinetics_label(row[0])]))
        return items

    with open(osp.join(ann, 'kinetics_train.csv')) as f:
        labels = sorted({_kinetics_label(r[0])
                         for r in list(csv.reader(f))[1:]})
    class_map = {lb: i for i, lb in enumerate(labels)}
    return [(read('kinetics_train.csv'), read('kinetics_val.csv'),
             read('kinetics_test.csv', test=True))]


@register_parser('sthv1')
def parse_sthv1_splits(data_root, level=1):
    """Something-Something V1: ``;``-separated csvs + label list csv."""
    ann = osp.join(data_root, 'annotations')
    with open(osp.join(ann, 'something-something-v1-labels.csv')) as f:
        class_map = {ln.strip(): i for i, ln in enumerate(f) if ln.strip()}

    def read(name, test=False):
        items = []
        with open(osp.join(ann, name)) as f:
            for line in f:
                if not line.strip():
                    continue
                parts = line.strip().split(';')
                vid = _strip_to_level(parts[0], level)
                items.append((vid, -1 if test else class_map[parts[1]]))
        return items

    return [(read('something-something-v1-train.csv'),
             read('something-something-v1-validation.csv'),
             read('something-something-v1-test.csv', test=True))]


@register_parser('sthv2')
def parse_sthv2_splits(data_root, level=1):
    """Something-Something V2: json annotations; the template's [] brackets
    are stripped before the label lookup."""
    ann = osp.join(data_root, 'annotations')
    with open(osp.join(ann, 'something-something-v2-labels.json')) as f:
        class_map = json.load(f)

    def read(name, test=False):
        with open(osp.join(ann, name)) as f:
            records = json.load(f)
        items = []
        for rec in records:
            vid = _strip_to_level(rec['id'], level)
            if test:
                items.append((vid, -1))
            else:
                template = rec['template'].replace('[', '').replace(']', '')
                items.append((vid, int(class_map[template])))
        return items

    return [(read('something-something-v2-train.json'),
             read('something-something-v2-validation.json'),
             read('something-something-v2-test.json', test=True))]


@register_parser('mit')
def parse_mit_splits(data_root, level=2):
    """Moments in Time: moments_categories.txt (name,id) + training/
    validationSet.csv of ``class/video.mp4,...`` rows."""
    ann = osp.join(data_root, 'annotations')
    class_map = {}
    with open(osp.join(ann, 'moments_categories.txt')) as f:
        for line in f:
            if line.strip():
                name, idx = line.strip().split(',')
                class_map[name] = int(idx)

    def read(name):
        with open(osp.join(ann, name)) as f:
            return [(osp.splitext(row[0])[0], class_map[osp.dirname(row[0])])
                    for row in csv.reader(f) if row]

    train = read('trainingSet.csv')
    val = read('validationSet.csv')
    return [(train, val, val)]  # MiT has no public test labels


@register_parser('mmit')
def parse_mmit_splits(data_root, level=2):
    """Multi-Moments in Time: csv rows ``path,label1,label2,...`` →
    multi-label items."""
    ann = osp.join(data_root, 'annotations')

    def read(name):
        with open(osp.join(ann, name)) as f:
            return [(osp.splitext(row[0])[0], [int(x) for x in row[1:]])
                    for row in csv.reader(f) if row]

    train = read('trainingSet.csv')
    val = read('validationSet.csv')
    return [(train, val, val)]


@register_parser('davis2017')
def parse_davis2017_splits(data_root, level=1):
    sets = osp.join(data_root, 'DAVIS', 'ImageSets', '2017')

    def read(name):
        with open(osp.join(sets, name)) as f:
            return [(vid, i) for i, vid in enumerate(f.read().split())]

    return [(read('train.txt'), read('val.txt'), read('test-dev.txt'))]


@register_parser('jhmdb')
def parse_jhmdb_splits(data_root, level=1):
    """JHMDB: the 3 official splits stored in JHMDB-GT.pkl (latin1)."""
    import pickle
    with open(osp.join(data_root, 'JHMDB', 'JHMDB-GT.pkl'), 'rb') as f:
        gt = pickle.load(f, encoding='latin1')
    splits = []
    for tr, te in zip(gt['train_videos'], gt['test_videos']):
        splits.append(([(v, i) for i, v in enumerate(tr)],
                       [(v, i) for i, v in enumerate(te)]))
    return splits


@register_parser('vip')
def parse_vip_splits(data_root, level=1):
    lists = osp.join(data_root, 'VIP_Fine', 'lists')

    def read(name):
        with open(osp.join(lists, name)) as f:
            return [(vid.strip(), i)
                    for i, vid in enumerate(f) if vid.strip()]

    return [(read('train_videos.txt'), read('val_videos.txt'),
             read('test_videos.txt'))]


def format_lines(subset, frame_info, shuffle=False, seed=0):
    """Render annotation lines for one subset (reference
    build_file_list.py:86-157). Rawframes → ``dir num_frames label``,
    videos → ``path label``; multi-label items append every label."""
    lines = []
    for vid, label in subset:
        if vid not in frame_info:
            continue
        path, n_rgb, _ = frame_info[vid]
        labels = label if isinstance(label, list) else [label]
        label_str = ' '.join(str(x) for x in labels)
        if n_rgb > 0:  # rawframes
            lines.append(f'{vid} {n_rgb} {label_str}\n')
        else:  # videos (path includes the extension)
            lines.append(f'{path} {label_str}\n')
    if shuffle:
        import random
        random.Random(seed).shuffle(lines)
    return lines


def lines_to_records(lines, fmt='rawframes'):
    """txt annotation lines → json-able dicts (reference
    anno_txt2json.py:30-90): rawframes lines carry ``frame_dir
    total_frames label...``, video lines ``filename label...``."""
    records = []
    for line in lines:
        parts = line.strip().split()
        if not parts:
            continue
        if fmt == 'rawframes':
            records.append(dict(frame_dir=parts[0],
                                total_frames=int(parts[1]),
                                label=[int(x) for x in parts[2:]]))
        else:
            records.append(dict(filename=parts[0],
                                label=[int(x) for x in parts[1:]]))
    return records
