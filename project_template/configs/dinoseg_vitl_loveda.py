# DinoSeg (DINOv3 ViT-L/16 sat493m trunk + light dense head) on LoveDA —
# the transformer fine-tune counterpart of farseg_r50_loveda.py.  Reference
# trunk: ever/module/dinov3/models/vision_transformer.py:430-453
# (vitl16_sat493m); dense protocol: get_intermediate_layers (:296-333).
config = dict(
    model=dict(type='DinoSeg', params=dict(
        backbone=dict(
            name='vitl16_sat493m',
            pretrained='',       # path to a converted sat493m .pth (optional)
            drop_path_rate=0.0,
        ),
        classes=7,
        head=dict(hidden=0, n_taps=1),
        loss=dict(ignore_index=255, ce=dict(), dice=None),
        dtype='bfloat16',
    )),
    data=dict(
        train=dict(type='loveda', params=dict(
            split='train', total_batch_size=8, num_workers=8,
            sampler_type='StepDistributedSampler',
            crop_size=512,
        )),
        test=dict(type='loveda', params=dict(
            split='val', batch_size=8, sampler_type='SequentialSampler',
        )),
    ),
    learning_rate=dict(type='cosine', params=dict(
        base_lr=1e-4, max_iters=15000,
        warmup=dict(type='linear', step=500, ratio=0.01))),
    optimizer=dict(type='adamw', params=dict(weight_decay=0.05),
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
