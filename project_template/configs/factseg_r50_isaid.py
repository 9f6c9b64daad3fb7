# FactSeg-R50 small-object segmentation on iSAID (BASELINE.json config 3):
# dual-branch foreground-activation head with collaborative probability.
# The built-in 'isaid' DATASET (ever_tpu.data.benchmarks) reads a standard
# iSAID checkout ({root}/{split}/images with *_instance_color_RGB.png masks,
# official palette -> classes 0..15, 255 = ignore); set data.*.params.root.
config = dict(
    model=dict(type='FactSeg', params=dict(
        encoder=dict(resnet_type='resnet50', pretrained=''),
        fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
        decoder=dict(in_channels=256, out_channels=128,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        classes=16,
        loss=dict(ignore_index=255, fa=dict(), dice=dict(smooth_value=1.0),
                  sem=dict()),
        dtype='bfloat16',
    )),
    data=dict(
        train=dict(type='isaid', params=dict(split='train',
                                             total_batch_size=32,
                                             sampler_type='StepDistributedSampler')),
        test=dict(type='isaid', params=dict(split='val', batch_size=8,
                                            sampler_type='SequentialSampler')),
    ),
    learning_rate=dict(type='poly', params=dict(base_lr=0.007, power=0.9,
                                                max_iters=60000)),
    optimizer=dict(type='sgd', params=dict(momentum=0.9, weight_decay=1e-4),
                   grad_clip=dict(max_norm=35.0)),
    train=dict(num_iters=60000, eval_after_train=True, log_interval_step=50,
               save_ckpt_interval_epoch=2),
)
