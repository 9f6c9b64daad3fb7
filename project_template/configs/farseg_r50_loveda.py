# Canonical FarSeg-R50 LoveDA config (BASELINE.json demo geometry: 512x512
# crops, 7 classes). The built-in 'loveda' DATASET (ever_tpu.data.loveda)
# reads a standard LoveDA checkout; set data.*.params.root (or via CLI opts).
config = dict(
    model=dict(type='FarSeg', params=dict(
        encoder=dict(
            resnet_type='resnet50',
            pretrained='',          # path to torchvision resnet50 .pth (optional)
        ),
        classes=7,
        loss=dict(ignore_index=255, ce=dict(), dice=None),
        dtype='bfloat16',
    )),
    data=dict(
        train=dict(type='loveda', params=dict(
            split='train', total_batch_size=64, num_workers=8,
            sampler_type='StepDistributedSampler',
            crop_size=512,
        )),
        test=dict(type='loveda', params=dict(
            split='val', batch_size=16, sampler_type='SequentialSampler',
        )),
    ),
    learning_rate=dict(type='poly', params=dict(
        base_lr=0.0075, power=0.9, max_iters=15000,
        warmup=dict(type='linear', step=500, ratio=0.01))),
    optimizer=dict(type='sgd', params=dict(momentum=0.9, weight_decay=1e-4),
                   grad_clip=dict(max_norm=35.0)),
    train=dict(
        num_iters=15000,
        forward_times=1,
        eval_per_epoch=False,
        eval_after_train=True,
        log_interval_step=50,
        save_ckpt_interval_epoch=4,
        distributed=True,
    ),
)
