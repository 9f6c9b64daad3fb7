"""Torch-checkpoint → flax conversion (pretrained backbone path)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ever_tpu.module  # noqa: F401, E402
from ever_tpu.core import builder  # noqa: E402
from ever_tpu.util import weight_io  # noqa: E402


def _fake_torchvision_resnet18_sd(seed=0):
    """Build a state dict with torchvision resnet18 key names/shapes."""
    rng = np.random.default_rng(seed)
    sd = {}

    def t(shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    def add_bn(prefix, c):
        sd[f'{prefix}.weight'] = t((c,))
        sd[f'{prefix}.bias'] = t((c,))
        sd[f'{prefix}.running_mean'] = t((c,))
        sd[f'{prefix}.running_var'] = torch.abs(t((c,))) + 0.5
        sd[f'{prefix}.num_batches_tracked'] = torch.tensor(1)

    sd['conv1.weight'] = t((64, 3, 7, 7))
    add_bn('bn1', 64)
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for li, (cin, cout) in enumerate(chans, start=1):
        for bi in range(2):
            in_c = cin if bi == 0 else cout
            sd[f'layer{li}.{bi}.conv1.weight'] = t((cout, in_c, 3, 3))
            add_bn(f'layer{li}.{bi}.bn1', cout)
            sd[f'layer{li}.{bi}.conv2.weight'] = t((cout, cout, 3, 3))
            add_bn(f'layer{li}.{bi}.bn2', cout)
            if bi == 0 and li > 1:
                sd[f'layer{li}.0.downsample.0.weight'] = t((cout, cin, 1, 1))
                add_bn(f'layer{li}.0.downsample.1', cout)
    sd['fc.weight'] = t((1000, 512))
    sd['fc.bias'] = t((1000,))
    return sd


def test_convert_and_load_resnet18(tmp_path):
    sd = _fake_torchvision_resnet18_sd()
    pth = tmp_path / 'resnet18.pth'
    torch.save(sd, str(pth))

    model = builder.make_model({'type': 'ResNetEncoder',
                                'params': dict(resnet_type='resnet18')})
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init({'params': jax.random.key(0)}, x, train=True)
    params, batch_stats = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'])

    # stem kernel transposed OIHW → HWIO, values preserved
    expected = np.transpose(sd['conv1.weight'].numpy(), (2, 3, 1, 0))
    got = np.asarray(weight_io.flatten_tree(params)['resnet/conv1/kernel'])
    np.testing.assert_allclose(got, expected)

    # bn running stats landed in batch_stats
    bs_flat = weight_io.flatten_tree(batch_stats)
    np.testing.assert_allclose(
        np.asarray(bs_flat['resnet/bn1/BatchNorm_0/mean']),
        sd['bn1.running_mean'].numpy())

    # downsample mapped
    p_flat = weight_io.flatten_tree(params)
    np.testing.assert_allclose(
        np.asarray(p_flat['resnet/layer2/block0/downsample_conv/kernel']),
        np.transpose(sd['layer2.0.downsample.0.weight'].numpy(), (2, 3, 1, 0)))

    # loaded model still runs
    out = model.apply({'params': params, 'batch_stats': batch_stats}, x)
    assert out[0].shape == (1, 8, 8, 64)


def test_patch_first_conv_channel_recycling(tmp_path):
    sd = _fake_torchvision_resnet18_sd()
    pth = tmp_path / 'resnet18.pth'
    torch.save(sd, str(pth))

    model = builder.make_model({'type': 'ResNetEncoder',
                                'params': dict(resnet_type='resnet18',
                                               in_channels=5)})
    x = jnp.ones((1, 32, 32, 5))
    variables = model.init({'params': jax.random.key(0)}, x, train=True)
    params, _ = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'])
    kernel = np.asarray(weight_io.flatten_tree(params)['resnet/conv1/kernel'])
    assert kernel.shape == (7, 7, 5, 64)
    src = np.transpose(sd['conv1.weight'].numpy(), (2, 3, 1, 0))
    # channel i recycles pretrained channel i % 3, rescaled by 3/5
    np.testing.assert_allclose(kernel[:, :, 3], src[:, :, 0] * 3 / 5, rtol=1e-6)


def test_excepts_regex_drops_keys(tmp_path):
    sd = _fake_torchvision_resnet18_sd()
    pth = tmp_path / 'resnet18.pth'
    torch.save(sd, str(pth))
    model = builder.make_model({'type': 'ResNetEncoder',
                                'params': dict(resnet_type='resnet18')})
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init({'params': jax.random.key(0)}, x, train=True)
    params, _ = weight_io.load_weights(
        str(pth), variables['params'], variables['batch_stats'],
        excepts=r'layer4')
    flat_orig = weight_io.flatten_tree(variables['params'])
    flat_new = weight_io.flatten_tree(params)
    # layer4 untouched (random init preserved), layer1 overwritten
    np.testing.assert_allclose(
        np.asarray(flat_new['resnet/layer4/block0/conv1/kernel']),
        np.asarray(flat_orig['resnet/layer4/block0/conv1/kernel']))
    assert not np.allclose(
        np.asarray(flat_new['resnet/layer1/block0/conv1/kernel']),
        np.asarray(flat_orig['resnet/layer1/block0/conv1/kernel']))


def test_subtree_offset_majority_vote(tmp_path):
    """The load offset must be chosen by how many source keys land, not by
    a single sample key — one filtered/renamed first key used to make the
    loader silently apply zero tensors."""
    import jax
    import jax.numpy as jnp
    from ever_tpu.module.resnet import ResNetEncoder
    from ever_tpu.util.weight_io import flatten_tree, load_weights
    enc = ResNetEncoder(dict(resnet_type='resnet18'))
    variables = enc.init(jax.random.key(0),
                         jnp.zeros((1, 32, 32, 3), jnp.float32))
    flat = {f'params/{k}': np.asarray(v)
            for k, v in flatten_tree(variables['params']).items()}
    # weights are keyed WITHOUT the 'resnet/' wrapper (an encoder-only dump)
    src = {k.replace('params/resnet/', 'params/'): v for k, v in flat.items()}
    # poison the (sorted-)first key so a single-sample probe finds no offset
    src = {'params/___not_in_model/kernel': np.zeros(3, np.float32), **src}
    path = str(tmp_path / 'w.npz')
    np.savez(path, **src)
    new_params, _ = load_weights(path, variables['params'])
    got = flatten_tree(new_params)
    want = flatten_tree(variables['params'])
    # every real tensor landed (identical since src came from the model)
    assert all(np.allclose(np.asarray(got[k]), np.asarray(want[k]))
               for k in want)
