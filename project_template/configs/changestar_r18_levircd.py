# ChangeStar bi-temporal change detection on LEVIR-CD (BASELINE.json config 4).
# The built-in 'levircd' DATASET (ever_tpu.data.benchmarks) reads a standard
# LEVIR-CD checkout: {root}/{train|val|test}/{A,B,label}/*.png; set
# data.*.params.root below (or via CLI opts).
config = dict(
    model=dict(type='ChangeStar', params=dict(
        encoder=dict(resnet_type='resnet18', pretrained=''),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=256),
        decoder=dict(in_channels=256, out_channels=256,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        changemixin=dict(in_channels=512, inner_channels=16, num_convs=4,
                         scale_factor=4.0),
        classes=1,
        loss=dict(ignore_index=255, symmetry=True),
        dtype='bfloat16',
    )),
    data=dict(
        train=dict(type='levircd', params=dict(split='train',
                                               total_batch_size=16)),
        test=dict(type='levircd', params=dict(split='test', batch_size=8,
                                              sampler_type='SequentialSampler')),
    ),
    learning_rate=dict(type='poly', params=dict(base_lr=0.03, power=0.9,
                                                max_iters=40000)),
    optimizer=dict(type='sgd', params=dict(momentum=0.9, weight_decay=1e-4),
                   grad_clip=dict(max_norm=35.0)),
    train=dict(num_iters=40000, eval_after_train=True, log_interval_step=50,
               save_ckpt_interval_epoch=2),
)
