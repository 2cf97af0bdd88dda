import os
import tempfile

import pytest

from vfs_tpu.utils import (Config, Registry, build_from_cfg, parse_options)


def test_registry_and_build():
    CATS = Registry('cat')

    @CATS.register_module()
    class Tabby:
        def __init__(self, size=1):
            self.size = size

    assert 'Tabby' in CATS
    obj = build_from_cfg(dict(type='Tabby', size=3), CATS)
    assert obj.size == 3
    obj = build_from_cfg(dict(type='Tabby'), CATS, default_args=dict(size=7))
    assert obj.size == 7
    with pytest.raises(KeyError):
        build_from_cfg(dict(type='Missing'), CATS)
    with pytest.raises(KeyError):
        CATS.register_module()(Tabby)  # duplicate


def test_config_fromfile_and_merge():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'cfg.py')
        with open(path, 'w') as f:
            f.write("model = dict(type='X', backbone=dict(depth=18))\n"
                    "total_epochs = 100\n")
        cfg = Config.fromfile(path)
        assert cfg.model.type == 'X'
        assert cfg.model.backbone.depth == 18
        assert cfg.total_epochs == 100
        cfg.merge_from_dict({'model.backbone.depth': 50, 'new.key': 1})
        assert cfg.model.backbone.depth == 50
        assert cfg.new.key == 1


def test_parse_options():
    opts = parse_options(['a.b=1', 'c=True', 'd=hello', 'e=(1,2)'])
    assert opts == {'a.b': 1, 'c': True, 'd': 'hello', 'e': (1, 2)}
