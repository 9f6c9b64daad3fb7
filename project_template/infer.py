import os

import ever_tpu as er
from ever_tpu.core import registry

# same auto-registration as train.py: build_from_model_dir rebuilds the
# model from config.pkl, whose `type` may name a class defined in module/
_HERE = os.path.dirname(os.path.abspath(__file__))
for _d in ('module', 'data'):
    _p = os.path.join(_HERE, _d)
    if os.path.isdir(_p):
        registry.register_dir(_p, recursive=True)


def main(model_dir):
    model, variables, step = er.infer_tool.build_from_model_dir(model_dir)
    # boxes = er.sliding_window((H, W), 512, 512)
    # probs = er.magic.tiled_inference(predict_fn, scene, 512, 512, classes)


if __name__ == '__main__':
    import sys
    main(sys.argv[1])
