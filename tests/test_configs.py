import os
import textwrap

import pytest

from spectre_tpu.configs import parse_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "spectre_tpu", "configs")

ALL_CONFIGS = [
    "vit_mnist",
    "vit_cifar100",
    "fnet_mnist",
    "fnet_cifar100",
    "spectre_vit_mnist",
    "spectre_vit_cifar100",
    "dwt_cifar100",
    "spectre_branch",
    "distill_cifar100",
]


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_all_configs_parse_and_inherit(name):
    c = parse_config(os.path.join(CFG_DIR, name + ".py"))
    # every config inherits these from default.py via _base_
    assert c.random_seed == 42
    assert c.learning_rate == 1e-3
    assert c.model in ("vit", "spectre_vit", "spectre_branch")
    assert c.method in ("permut_mix", "fft_bare", "fft_mh", "dwt_embed", "dwt_token", "attention")
    assert c.num_patches == (c.img_size // c.patch_size) ** 2


def test_child_overrides_base(tmp_path):
    # The reference merged base-over-child (parser.py:25); we assert the fix.
    (tmp_path / "base.py").write_text("a = 1\nb = 2\n")
    (tmp_path / "child.py").write_text("_base_ = 'base.py'\na = 10\n")
    c = parse_config(str(tmp_path / "child.py"))
    assert c.a == 10
    assert c.b == 2


def test_both_base_spellings_and_lists(tmp_path):
    (tmp_path / "b1.py").write_text("x = 1\ny = 1\n")
    (tmp_path / "b2.py").write_text("y = 2\nz = 2\n")
    (tmp_path / "dunder.py").write_text("__base__ = 'b1.py'\n")
    (tmp_path / "listy.py").write_text("_base_ = ['b1.py', 'b2.py']\n")
    assert parse_config(str(tmp_path / "dunder.py")).x == 1
    c = parse_config(str(tmp_path / "listy.py"))
    assert c.x == 1 and c.y == 2 and c.z == 2  # later base wins among bases


def test_recursive_inheritance(tmp_path):
    (tmp_path / "root.py").write_text("a = 'root'\nb = 'root'\nc = 'root'\n")
    (tmp_path / "mid.py").write_text("_base_ = 'root.py'\nb = 'mid'\nc = 'mid'\n")
    (tmp_path / "leaf.py").write_text("_base_ = 'mid.py'\nc = 'leaf'\n")
    c = parse_config(str(tmp_path / "leaf.py"))
    assert (c.a, c.b, c.c) == ("root", "mid", "leaf")


def test_circular_inheritance_raises(tmp_path):
    (tmp_path / "a.py").write_text("_base_ = 'b.py'\n")
    (tmp_path / "b.py").write_text("_base_ = 'a.py'\n")
    with pytest.raises(ValueError, match="circular"):
        parse_config(str(tmp_path / "a.py"))


def test_private_names_excluded(tmp_path):
    (tmp_path / "cfg.py").write_text(textwrap.dedent("""
        import math
        _hidden = 5
        visible = math.pi
    """))
    c = parse_config(str(tmp_path / "cfg.py"))
    assert not hasattr(c, "_hidden")
    assert c.visible == pytest.approx(3.14159, abs=1e-4)
    assert hasattr(c, "math")  # module names leak like in the reference (dir() semantics)
