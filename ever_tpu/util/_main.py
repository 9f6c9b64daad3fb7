"""Project scaffolding (parity: ``ever/util/_main.py:4-23``)."""

from __future__ import annotations

import os

TRAIN_SCRIPT = '''\
import ever_tpu as er


def train(trainer_name='th_ddp'):
    trainer = er.trainer.get_trainer(trainer_name)()
    trainer.run()


if __name__ == '__main__':
    train()
'''

INFER_SCRIPT = '''\
import ever_tpu as er


def main(model_dir):
    model, variables, step = er.infer_tool.build_from_model_dir(model_dir)
    # boxes = er.sliding_window((H, W), 512, 512)
    # probs = er.magic.tiled_inference(predict_fn, scene, 512, 512, classes)


if __name__ == '__main__':
    import sys
    main(sys.argv[1])
'''


def create_project(path: str) -> None:
    for d in ('configs', 'module', 'data'):
        os.makedirs(os.path.join(path, d), exist_ok=True)
    with open(os.path.join(path, 'train.py'), 'w') as f:
        f.write(TRAIN_SCRIPT)
    with open(os.path.join(path, 'infer.py'), 'w') as f:
        f.write(INFER_SCRIPT)
    print(f'created project in {path}')
