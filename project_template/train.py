import os

import ever_tpu as er
from ever_tpu.core import registry

# auto-register this project's models/datasets so `@registry.MODEL.register`
# classes in module/ and data/ are importable by config `type` name
_HERE = os.path.dirname(os.path.abspath(__file__))
for _d in ('module', 'data'):
    _p = os.path.join(_HERE, _d)
    if os.path.isdir(_p):
        registry.register_dir(_p, recursive=True)


def train(trainer_name=None):
    # None defers to the --trainer CLI flag (default th_ddp); passing a name
    # here would silently override it
    trainer = er.trainer.get_trainer(trainer_name)()
    trainer.run()


if __name__ == '__main__':
    train()
