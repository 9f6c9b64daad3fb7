# ChangeOS building damage assessment on xView2 (BASELINE.json config 5):
# localization + damage branches; whole-scene deployment composes with
# er.magic.tiled_inference over the pre/post-event scene pair.
# The built-in 'xview2' DATASET (ever_tpu.data.benchmarks) reads a standard
# xBD checkout: {root}/{split}/images/{id}_{pre,post}_disaster.png +
# targets/*_target.png; set data.*.params.root below (or via CLI opts).
config = dict(
    model=dict(type='ChangeOS', params=dict(
        encoder=dict(resnet_type='resnet50', pretrained=''),
        fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
        decoder=dict(in_channels=256, out_channels=256,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        damage_classes=5,
        loss=dict(ignore_index=255),
        dtype='bfloat16',
    )),
    data=dict(
        train=dict(type='xview2', params=dict(split='train',
                                              total_batch_size=32)),
        test=dict(type='xview2', params=dict(split='hold', batch_size=8,
                                             sampler_type='SequentialSampler')),
    ),
    learning_rate=dict(type='poly', params=dict(base_lr=0.02, power=0.9,
                                                max_iters=60000)),
    optimizer=dict(type='sgd', params=dict(momentum=0.9, weight_decay=1e-4),
                   grad_clip=dict(max_norm=35.0)),
    train=dict(num_iters=60000, eval_after_train=True, log_interval_step=50,
               save_ckpt_interval_epoch=2),
)
