# VFS ResNet-18 pretraining with the augmentation chain ON THE TPU.
#
# Same model/optimization as r18_sgd_cos_100e_r2_1xNx8_k400.py; the host
# pipeline shrinks to decode + one staging resize (uint8), and the full
# RandomResizedCrop/Flip/ColorJitter/GrayScale/Blur/Normalize chain runs
# inside the jitted train step (vfs_tpu/ops/device_aug.py). Measured on
# a 1-core host + TPU v5e (tools/analysis/bench_pretrain.py, batch 16,
# 2 workers): loader 2.98 -> 9.81 samples/s, end-to-end 0.145 -> 0.910
# steps/s (6.3x); the device pays ~8% step time for the chain. Use when
# pretraining is input-starved (SURVEY §7 risk) — semantics mirror the
# host transforms (crop rects are sampled in original-frame coordinates).

_DEPTH = 18
_CH = 512
_PRED_MID = 128
_INTRA = True
_NEIGHBOR = 24
_REPEAT = 2
_NUM_CLIPS = 8
_MEAN = [123.675, 116.28, 103.53]
_STD = [58.395, 57.12, 57.375]
_STAGING = (320, 256)  # (W, H) uint8 frames shipped to the device

model = dict(
    type='SimSiamBaseTracker',
    backbone=dict(
        type='ResNet', depth=_DEPTH, pretrained=None, out_indices=(3, ),
        norm_eval=False, zero_init_residual=True),
    img_head=dict(
        type='SimSiamHead', in_channels=_CH,
        num_projection_fcs=3, projection_mid_channels=_CH,
        projection_out_channels=_CH,
        num_predictor_fcs=2, predictor_mid_channels=_PRED_MID,
        predictor_out_channels=_CH, with_norm=True,
        loss_feat=dict(type='CosineSimLoss', negative=False),
        spatial_type='avg'))

train_cfg = dict(intra_video=_INTRA)

test_cfg = dict(
    precede_frames=20, topk=10, temperature=0.07,
    strides=(1, 2, 1, 1), out_indices=(2, ),
    neighbor_range=_NEIGHBOR,
    with_first=True, with_first_neighbor=True,
    output_dir='eval_results')

img_norm_cfg = dict(mean=_MEAN, std=_STD, to_bgr=False)

# the chain that runs on the device, in order (the same dicts the host
# pipeline would use — types/kwargs match the host transforms)
device_aug = dict(
    out_hw=(224, 224),
    transforms=[
        dict(type='RandomResizedCrop', area_range=(0.2, 1.),
             same_across_clip=False, same_on_clip=False),
        dict(type='Resize', scale=(224, 224), keep_ratio=False),
        dict(type='Flip', flip_ratio=0.5, same_across_clip=False,
             same_on_clip=False),
        dict(type='ColorJitter', brightness=0.4, contrast=0.4,
             saturation=0.4, hue=0.1, p=0.8, same_across_clip=False,
             same_on_clip=False),
        dict(type='RandomGrayScale', p=0.2, same_across_clip=False,
             same_on_clip=False),
        dict(type='RandomGaussianBlur', p=0.5, same_across_clip=False,
             same_on_clip=False),
    ])

train_pipeline = [
    dict(type='DecordInit'),
    dict(type='SampleFrames', clip_len=1, frame_interval=0,
         num_clips=_NUM_CLIPS, out_of_bound_opt='loop'),
    dict(type='Clip2Frame', clip_len=4),
    dict(type='DecordDecode'),
    dict(type='DeviceAug', scale=_STAGING),
    dict(type='Collect', keys=['imgs', 'label', 'orig_hw'], meta_keys=()),
]

val_pipeline = [
    dict(type='SequentialSampleFrames', frame_interval=1),
    dict(type='RawFrameDecode'),
    dict(type='Resize', scale=(-1, 480), keep_ratio=True),
    dict(type='Flip', flip_ratio=0),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCTHW'),
    dict(type='Collect', keys=['imgs', 'ref_seg_map'],
         meta_keys=('frame_dir', 'frame_inds', 'original_shape',
                    'seg_map')),
    dict(type='ToTensor', keys=['imgs', 'ref_seg_map']),
]

_DAVIS = dict(
    type='DavisDataset',
    ann_file='data/davis/DAVIS/ImageSets/davis2017_val_list_rawframes.txt',
    data_prefix='data/davis/DAVIS/JPEGImages/480p',
    anno_prefix='data/davis/DAVIS/Annotations/480p',
    data_root='data/davis/DAVIS',
    pipeline=val_pipeline, test_mode=True)

data = dict(
    videos_per_gpu=32,
    workers_per_gpu=16,
    val_workers_per_gpu=1,
    train=dict(
        type='RepeatDataset', times=_REPEAT,
        dataset=dict(
            type='VideoDataset',
            ann_file='data/kinetics400/kinetics400_train_list_videos.txt',
            data_prefix='data/kinetics400/videos_train',
            pipeline=train_pipeline)),
    val=dict(_DAVIS), test=dict(_DAVIS))

optimizer = dict(type='SGD', lr=0.05, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='CosineAnnealing', min_lr=0, by_epoch=False)
total_epochs = 100
checkpoint_config = dict(interval=1)
evaluation = dict(interval=1, metrics='davis',
                  key_indicator='feat_1.J&F-Mean', rule='greater')
log_config = dict(interval=50)
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
