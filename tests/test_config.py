"""Config system (SURVEY.md §5): defaults, TOML overrides, validation."""

import pytest

from tpu_zkpool.config import Config, RlweConfig, KernelConfig, load_config, get_config, set_config


def test_defaults_match_reference_constants():
    cfg = Config().validate()
    # scripts/rlwe_keygen.py:18-25 / generate_audit.py:24-34
    assert cfg.rlwe.n == 1024 and cfg.rlwe.q == 167772161
    assert cfg.rlwe.t == 256 and cfg.rlwe.delta == 655360
    assert cfg.rlwe.msg_slots == 64 and cfg.rlwe.pack_width == 7
    assert cfg.rlwe.shamir_threshold == 2 and cfg.rlwe.shamir_shares == 3


def test_toml_roundtrip(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text("""
[rlwe]
noise_bound = 5

[mesh]
shape = [2, 4]
axis_names = ["dp", "tp"]

[kernel]
msm_window_bits = 10
msm_backend = "xla"
""")
    cfg = Config.from_toml(str(p))
    assert cfg.rlwe.noise_bound == 5 and cfg.rlwe.q == 167772161
    assert cfg.mesh.shape == (2, 4) and cfg.mesh.axis_names == ("dp", "tp")
    assert cfg.kernel.msm_window_bits == 10


def test_validation_rejects_bad_params(tmp_path):
    with pytest.raises(AssertionError):
        Config(rlwe=RlweConfig(n=1000)).validate()          # not power of 2
    with pytest.raises(AssertionError):
        Config(rlwe=RlweConfig(q=167772160)).validate()     # not NTT-friendly
    with pytest.raises(AssertionError):
        Config(kernel=KernelConfig(msm_backend="cuda")).validate()
    p = tmp_path / "bad.toml"
    p.write_text("[kernel]\nnonexistent_knob = 1\n")
    with pytest.raises(AssertionError):
        Config.from_toml(str(p))


def test_global_config_set_get():
    old = get_config()
    try:
        cfg = set_config(Config(kernel=KernelConfig(msm_window_bits=8)))
        assert get_config().kernel.msm_window_bits == 8
    finally:
        set_config(old)


def test_mesh_make_virtual():
    from tpu_zkpool.config import MeshConfig
    import jax
    n = len(jax.devices())
    mesh = MeshConfig(shape=(n,), axis_names=("dp",)).make()
    assert mesh.devices.size == n
