"""Project scaffolding (parity: ``ever/util/_main.py:4-23``)."""

from __future__ import annotations

import os

_REGISTER_SNIPPET = '''\
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
'''

TRAIN_SCRIPT = _REGISTER_SNIPPET + '''\


def train(trainer_name=None):
    # None defers to the --trainer CLI flag (default th_ddp); passing a name
    # here would silently override it
    trainer = er.trainer.get_trainer(trainer_name)()
    trainer.run()


if __name__ == '__main__':
    train()
'''

INFER_SCRIPT = _REGISTER_SNIPPET + '''\


def main(model_dir):
    model, variables, step = er.infer_tool.build_from_model_dir(model_dir)
    # boxes = er.sliding_window((H, W), 512, 512)
    # probs = er.magic.tiled_inference(predict_fn, scene, 512, 512, classes)


if __name__ == '__main__':
    import sys
    main(sys.argv[1])
'''


def _template_dir() -> str | None:
    """Locate the shipped ``project_template/`` (repo checkout: sibling of
    the ``ever_tpu`` package).  None when only the package is installed."""
    import ever_tpu
    cand = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(ever_tpu.__file__))), 'project_template')
    return cand if os.path.isdir(cand) else None


def create_project(path: str) -> None:
    """Scaffold a user project.

    When the full ``project_template/`` tree is available it is copied
    whole — train/infer entry points plus the five benchmark configs
    (farseg_r50_loveda, factseg_r50_isaid, changestar/changemask_levircd,
    changeos_r50_xview2).  Otherwise fall back to minimal scaffolding with
    the same layout (parity: ``ever/util/_main.py:4-23``).
    """
    tpl = _template_dir()
    if tpl is not None:
        import shutil
        shutil.copytree(tpl, path, dirs_exist_ok=True,
                        ignore=shutil.ignore_patterns('__pycache__', '.gitkeep'))
        for d in ('configs', 'module', 'data'):
            os.makedirs(os.path.join(path, d), exist_ok=True)
    else:
        for d in ('configs', 'module', 'data'):
            os.makedirs(os.path.join(path, d), exist_ok=True)
        with open(os.path.join(path, 'train.py'), 'w') as f:
            f.write(TRAIN_SCRIPT)
        with open(os.path.join(path, 'infer.py'), 'w') as f:
            f.write(INFER_SCRIPT)
    print(f'created project in {path}')
