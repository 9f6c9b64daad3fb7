import copy
import pickle

import pytest

from ever_tpu.core.config import AttrDict, FrozenConfig, import_config, save_pkl


def test_attrdict_attribute_access():
    d = AttrDict(dict(a=1, b=dict(c=2)))
    assert d.a == 1
    assert d.b.c == 2
    d.x = dict(y=3)
    assert d.x.y == 3
    with pytest.raises(AttributeError):
        _ = d.missing


def test_attrdict_list_of_dict_promotion():
    d = AttrDict(dict(stages=[dict(a=1), dict(b=2)]))
    assert d.stages[0].a == 1
    assert d.stages[1].b == 2
    # keys shadowed by dict methods stay reachable via item access
    d2 = AttrDict(dict(items=[dict(a=1)]))
    assert d2['items'][0].a == 1


def test_attrdict_recursive_update():
    d = AttrDict(dict(model=dict(classes=7, head=dict(depth=2, act='relu'))))
    d.update(dict(model=dict(classes=5, head=dict(act='gelu'))))
    assert d.model.classes == 5
    assert d.model.head.depth == 2  # preserved by recursive merge
    assert d.model.head.act == 'gelu'


def test_attrdict_update_replaces_non_dict():
    d = AttrDict(dict(a=dict(b=1)))
    d.update(dict(a=[1, 2]))
    assert d.a == [1, 2]


def test_update_from_list_literal_eval():
    d = AttrDict(dict(train=dict(lr=0.1)))
    d.update_from_list(['train.lr', '0.01', 'train.iters', '100',
                        'data.name', 'loveda', 'train.sizes', '[1, 2]'])
    assert d.train.lr == 0.01
    assert d.train.iters == 100
    assert d.data.name == 'loveda'
    assert d.train.sizes == [1, 2]


def test_update_from_list_odd_length_raises():
    with pytest.raises(ValueError):
        AttrDict().update_from_list(['a'])


def test_to_dict_roundtrip():
    d = AttrDict(dict(a=dict(b=[dict(c=1)])))
    plain = d.to_dict()
    assert type(plain) is dict
    assert type(plain['a']) is dict
    assert type(plain['a']['b'][0]) is dict
    assert AttrDict(plain) == d


def test_pickle_and_deepcopy():
    d = AttrDict(dict(a=dict(b=1)))
    d2 = pickle.loads(pickle.dumps(d))
    assert d2.a.b == 1
    d3 = copy.deepcopy(d)
    d3.a.b = 9
    assert d.a.b == 1


def test_import_config_py_and_pkl(tmp_path):
    cfg_file = tmp_path / 'cfg.py'
    cfg_file.write_text("config = dict(model=dict(type='X', params=dict(k=1)))\n")
    cfg = import_config(str(cfg_file))
    assert cfg.model.type == 'X'
    assert cfg.model.params.k == 1

    pkl = tmp_path / 'config.pkl'
    save_pkl(cfg, str(pkl))
    cfg2 = import_config(str(pkl))
    assert cfg2.model.params.k == 1


def test_import_config_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        import_config(str(tmp_path / 'nope.py'))
    bad = tmp_path / 'bad.py'
    bad.write_text('x = 1\n')
    with pytest.raises(AttributeError):
        import_config(str(bad))


def test_frozen_config():
    fc = FrozenConfig(dict(a=1, b=dict(c=2)))
    assert fc.a == 1 and fc.b.c == 2 and fc['a'] == 1
    assert 'a' in fc and fc.get('z', 9) == 9
    with pytest.raises(AttributeError):
        fc.a = 2
    assert fc.to_dict() == {'a': 1, 'b': {'c': 2}}
