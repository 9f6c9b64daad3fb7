# ChangeMask semantic-change detection on LEVIR-CD (BASELINE.json config 4
# variant): per-temporal semantic decoder + binary change decoder with
# temporal-consistency regularisation.
config = dict(
    model=dict(type='ChangeMask', params=dict(
        encoder=dict(resnet_type='resnet18', pretrained=''),
        fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=256),
        decoder=dict(in_channels=256, out_channels=256,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        classes=2,
        loss=dict(ignore_index=255, consistency_weight=0.1),
        dtype='bfloat16',
    )),
    data=dict(
        train=dict(type='levircd', params=dict(split='train',
                                               total_batch_size=16)),
        test=dict(type='levircd', params=dict(split='test', batch_size=8,
                                              sampler_type='SequentialSampler')),
    ),
    learning_rate=dict(type='cosine', params=dict(base_lr=0.01,
                                                  max_iters=40000,
                                                  eta_min=1e-5)),
    optimizer=dict(type='adamw', params=dict(weight_decay=0.01),
                   grad_clip=dict(max_norm=35.0)),
    train=dict(num_iters=40000, eval_after_train=True, log_interval_step=50,
               save_ckpt_interval_epoch=2),
)
