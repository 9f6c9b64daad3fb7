"""Public API surface + inference tooling tests."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ever_tpu as er


def test_top_level_exports():
    # parity with reference ever/__init__.py:23-30
    for name in ('registry', 'builder', 'config', 'to', 'param_util', 'data',
                 'metric', 'preprocess', 'infer_tool', 'ERDataLoader',
                 'LearningRateBase', 'ERModule', 'Transform', 'MultiTransform',
                 'Callback', 'seed_torch', 'sliding_window', 'auto_device',
                 'tta', 'TestTimeAugmentation', 'info'):
        assert hasattr(er, name), f'missing export: {name}'


def test_reference_compat_spellings():
    """Subpackage names a reference user imports directly (ever/module/
    __init__.py:20, ever/preprocess/__init__.py:1-4, ever/trainer/
    __init__.py:4,14)."""
    from ever_tpu.module import dinov3
    for name in ('DinoVisionTransformer', 'DINOHead', 'vit_small', 'vit_base',
                 'vit_large', 'vit_so400m', 'vit_huge2', 'vit_giant2',
                 'vit_7b', 'vitl16_sat493m', 'vit7b16_sat493m',
                 'get_convnext_arch', 'RMSNorm', 'LayerScale'):
        assert hasattr(dinov3, name), f'missing dinov3 name: {name}'
    assert dinov3.vit_small().vit_type == 'vit_small'
    assert dinov3.vitl16_sat493m().n_storage_tokens == 4
    assert dinov3.get_convnext_arch('convnext_tiny')().model_name == 'convnext_tiny'

    from ever_tpu.preprocess import ConstantPad, ToTensor, albu
    assert albu.ToTensor is ToTensor
    img, mask = ToTensor()(np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.uint8))
    assert img.dtype == np.float32 and mask.dtype == np.int32
    img, mask = ConstantPad(min_height=16, min_width=16)(img, mask)
    assert img.shape == (16, 16, 3) and mask[10, 10] == 255  # mask pad = ignore

    from ever_tpu.trainer import THDDPGANTrainer, THDDPTrainer, get_default_parser
    from ever_tpu.trainer.trainer import SPMDTrainer
    assert THDDPTrainer is SPMDTrainer
    args = get_default_parser().parse_args(['--config_path', 'x', '--model_dir', 'y'])
    assert args.trainer == 'th_ddp'


def test_registry_population():
    assert {'FarSeg', 'FactSeg', 'ChangeStar', 'ChangeMask', 'ChangeOS',
            'ResNetEncoder', 'HRNetEncoder', 'DenseNetEncoder', 'EFNetEncoder',
            'ResNeStEncoder', 'ConvNeXtEncoder', 'ViTEncoder', 'FarSegHead',
            'ASPPHead', 'PPMHead', 'Deeplabv3pHead',
            'HRNetHead'} <= set(er.registry.MODEL)
    assert {'multistep', 'poly', 'cosine', 'constant', 'search'} <= set(er.registry.LR)
    assert {'sgd', 'adam', 'adamw', 'lamb', 'fused_adam'} <= set(er.registry.OPT)
    assert {'softmax_ce', 'dice', 'tversky', 'ohem', 'focal'} <= set(er.registry.LOSS)
    assert 'geotile' in er.registry.DATASET


def test_project_scaffold(tmp_path):
    out = subprocess.run(
        [sys.executable, '-m', 'ever_tpu', 'create', str(tmp_path / 'proj')],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    for f in ('train.py', 'infer.py', 'configs', 'module', 'data'):
        assert (tmp_path / 'proj' / f).exists()


def test_export_model_roundtrip(tmp_path):
    """jax.export serialisation of a trained model (torch.jit.trace analog)."""
    from ever_tpu.core.config import save_pkl
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.core import builder

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        head=dict(fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=16),
                  fs_relation=dict(scene_embedding_channels=512,
                                   in_channels_list=(16,) * 4,
                                   out_channels=16, scale_aware_proj=True),
                  fpn_decoder=dict(in_channels=16, out_channels=16,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4)),
        classes=3)})
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path), model, factory.build(0.01), None)
    x = np.zeros((1, 32, 32, 3), np.float32)
    y = np.zeros((1, 32, 32), np.int32)
    tl.init_state((x, y))
    tl.checkpoint.set_global_step(1)
    tl.checkpoint.save()

    cfg_path = tmp_path / 'config.py'
    cfg_path.write_text(
        'config = dict(model=dict(type="FarSeg", params='
        + repr(model.config.to_dict()) + '))\n')
    out_path = tmp_path / 'model.jaxexport'
    er.infer_tool.export_model(str(cfg_path), str(tmp_path / 'checkpoint-1.ckpt'),
                               (1, 32, 32, 3), str(out_path))
    assert out_path.exists() and out_path.stat().st_size > 0

    # deserialise and run
    from jax import export as jax_export
    with open(out_path, 'rb') as f:
        exported = jax_export.deserialize(f.read())
    probs = exported.call(jnp.zeros((1, 32, 32, 3)))
    assert probs.shape == (1, 32, 32, 3)


def test_as_ddp_inference_loader_rewraps():
    from ever_tpu.data import as_ddp_inference_loader
    from ever_tpu.data.distributed import DistributedNonOverlapSeqSampler, \
        StepDistributedSampler
    from ever_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return np.zeros(2, np.float32)

    ds = DS()
    dl = DataLoader(ds, sampler=StepDistributedSampler(ds), batch_size=4)
    wrapped = as_ddp_inference_loader(dl)
    assert isinstance(wrapped.sampler, DistributedNonOverlapSeqSampler)
    assert wrapped.batch_size == 4
    # idempotent
    assert as_ddp_inference_loader(wrapped) is wrapped


def test_template_configs_build_models():
    """Every project_template config instantiates its model via the registry
    (the dataset types are placeholders users register)."""
    import glob
    from ever_tpu.core import builder
    from ever_tpu.core.config import import_config

    cfgs = glob.glob('project_template/configs/*.py')
    assert len(cfgs) >= 5
    for path in cfgs:
        cfg = import_config(path)
        model = builder.make_model(cfg.model)
        assert model is not None, path


def test_save_from_pretrained_roundtrip(tmp_path):
    """ERModule.save_pretrained/from_pretrained (the reference's hub-mixin
    workflow, ``configurable.py:2,5``) round-trips config + variables."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ever_tpu.core import builder
    from ever_tpu.interface.module import ERModule

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        head=dict(fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
                  fs_relation=dict(scene_embedding_channels=512,
                                   in_channels_list=(32,) * 4,
                                   out_channels=32, scale_aware_proj=True),
                  fpn_decoder=dict(in_channels=32, out_channels=32,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4)),
        classes=5)})
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    variables = model.init({'params': jax.random.key(0)}, x)
    ref = model.apply(variables, x)

    model.save_pretrained(str(tmp_path / 'hub'), variables)
    m2, v2 = ERModule.from_pretrained(str(tmp_path / 'hub'))
    assert m2.config.classes == 5

    # bit-exact CONFIG round-trip: the restored module's merged config equals
    # the saved module's, including the nested encoder/head/fs_relation dicts
    # (the reference's hub-mixin contract stores config.json alongside the
    # weights, ``ever/interface/configurable.py:2,5``).  JSON turns tuples
    # into lists — normalize both sides through the same jsonable view.
    from ever_tpu.interface.module import _jsonable
    assert _jsonable(m2.config) == _jsonable(model.config)

    # bit-exact WEIGHTS round-trip: every leaf identical in value, dtype and
    # shape (msgpack must not quietly upcast or reorder anything)
    import jax as _jax
    ref_leaves = _jax.tree_util.tree_flatten_with_path(variables)[0]
    new_leaves = _jax.tree_util.tree_flatten_with_path(v2)[0]
    assert [p for p, _ in ref_leaves] == [p for p, _ in new_leaves]
    for (path, a), (_, b) in zip(ref_leaves, new_leaves):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape, path
        np.testing.assert_array_equal(a, b, err_msg=str(path))

    out = m2.apply(v2, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_push_to_hub_offline(tmp_path, monkeypatch):
    """ERModule.push_to_hub (parity: PyTorchModelHubMixin via the reference
    ConfigurableMixin, ``configurable.py:2,5``) serializes the
    save_pretrained layout and hands it to huggingface_hub — exercised here
    against a recording fake so the test stays network-free."""
    import sys
    import types
    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.interface.module import ERModule

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'),
        head=dict(fpn=dict(in_channels_list=(64, 128, 256, 512), out_channels=32),
                  fs_relation=dict(scene_embedding_channels=512,
                                   in_channels_list=(32,) * 4,
                                   out_channels=32, scale_aware_proj=True),
                  fpn_decoder=dict(in_channels=32, out_channels=32,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4)),
        classes=5)})
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    variables = model.init({'params': jax.random.key(0)}, x)

    calls = []

    class FakeApi:
        def __init__(self, token=None):
            calls.append(('init', token))

        def create_repo(self, repo_id, private=False, exist_ok=False):
            calls.append(('create_repo', repo_id, private, exist_ok))

        def upload_folder(self, repo_id, folder_path, commit_message=None):
            # the uploaded folder must be a loadable from_pretrained dir
            m2, v2 = ERModule.from_pretrained(folder_path)
            assert m2.config.classes == 5
            assert jax.tree.leaves(v2)
            calls.append(('upload_folder', repo_id, commit_message))
            return f'https://hub/{repo_id}'

    monkeypatch.setitem(sys.modules, 'huggingface_hub',
                        types.SimpleNamespace(HfApi=FakeApi))

    url = model.push_to_hub('user/farseg-demo', variables, token='tok')
    assert url == 'https://hub/user/farseg-demo'
    assert ('create_repo', 'user/farseg-demo', False, True) in calls
    assert calls[0] == ('init', 'tok')

    # push an existing directory as-is
    model.save_pretrained(str(tmp_path / 'hub'), variables)
    model.push_to_hub('user/farseg-demo2',
                      save_directory=str(tmp_path / 'hub'), create_repo=False)
    assert calls[-1] == ('upload_folder', 'user/farseg-demo2',
                         'upload FarSeg (ever_tpu)')

    # arg validation + non-save_pretrained dir rejection
    with pytest.raises(ValueError):
        model.push_to_hub('user/x')
    with pytest.raises(ValueError):
        model.push_to_hub('user/x', save_directory=str(tmp_path))


def test_param_util_freeze_aliases():
    """freeze_params/freeze_modules/freeze_bn masks (reference-named API)."""
    import jax.numpy as jnp
    from ever_tpu.util.param_util import (freeze_bn, freeze_modules,
                                          freeze_params)
    params = {
        'layer1': {'conv1': {'kernel': jnp.ones((3, 3, 4, 4))},
                   'bn1': {'scale': jnp.ones((4,)), 'bias': jnp.zeros((4,))}},
        'head': {'fc': {'kernel': jnp.ones((4, 2)), 'bias': jnp.zeros((2,))}},
    }
    m = freeze_params(params, 'layer1')
    assert m['layer1']['conv1']['kernel'] is False
    assert m['head']['fc']['kernel'] is True

    m = freeze_modules(params, 'fc')
    assert m['head']['fc']['bias'] is False
    assert m['layer1']['conv1']['kernel'] is True

    m = freeze_bn(params)
    assert m['layer1']['bn1']['scale'] is False
    assert m['layer1']['bn1']['bias'] is False
    assert m['layer1']['conv1']['kernel'] is True
    assert m['head']['fc']['kernel'] is True


def test_apply_freeze_hard_zeroes_updates():
    import jax
    import jax.numpy as jnp
    import optax
    from ever_tpu.util.param_util import apply_freeze, freeze_params
    params = {'enc': {'kernel': jnp.ones((2, 2))},
              'head': {'kernel': jnp.ones((2, 2))}}
    mask = freeze_params(params, 'enc')
    tx = apply_freeze(optax.sgd(0.1), mask)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert bool(jnp.all(new['enc']['kernel'] == 1.0))     # frozen
    assert bool(jnp.all(new['head']['kernel'] == 0.9))    # trained


def test_trainer_half_bn_noop():
    from ever_tpu.trainer.trainer import half_bn
    obj = {'a': 1}
    assert half_bn(obj) is obj


def test_tools_scripts_parse():
    """tools/ scripts stay syntactically valid (they run standalone on the
    TPU host and are not imported by the suite)."""
    import ast
    import glob
    for path in sorted(glob.glob('tools/*.py')):
        ast.parse(open(path).read(), filename=path)
