"""Typed configuration for fields, RLWE parameters, mesh shape, and kernel
tuning knobs (SURVEY.md §5 "Config / flag system").

The reference scatters these as module-top constants with env-var
fallbacks (``scripts/generate_audit.py:24-34``,
``demo-frontend/app/lib/shielded-pool.ts:4-19``); here one frozen
dataclass tree owns them, loadable from TOML and threaded through the
kernels/bench entry points. ``validate()`` cross-checks the derived
quantities (Delta = q // t, NTT-friendliness of q, packing geometry) so a
bad override fails loudly at load time.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from tpu_zkpool.fields import bn254


@dataclass(frozen=True)
class RlweConfig:
    """BFV/RLWE parameters (reference: scripts/rlwe_keygen.py:18-25,
    generate_audit.py:24-34)."""

    n: int = 1024                  # ring dimension
    q: int = 167772161             # ciphertext modulus (40 * 2^22 + 1)
    t: int = 256                   # plaintext modulus
    noise_bound: int = 3           # coefficients uniform in [-b, b]
    msg_slots: int = 64            # owner_x (32) + owner_y (32) bytes
    pack_bits: int = 32            # bits per packed slot
    pack_width: int = 7            # slots per BN254 field element
    shamir_threshold: int = 2
    shamir_shares: int = 3

    @property
    def delta(self) -> int:        # Delta = floor(q / t)
        return self.q // self.t

    def validate(self) -> None:
        assert self.n & (self.n - 1) == 0, "ring dim must be a power of two"
        # negacyclic NTT needs a 2n-th root of unity mod q
        assert (self.q - 1) % (2 * self.n) == 0, "q not NTT-friendly for 2n"
        assert self.pack_bits * self.pack_width < 254, "packing overflows Fr"
        assert 2 <= self.shamir_threshold <= self.shamir_shares


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for the sharded kernels (SURVEY.md §2.4)."""

    shape: tuple = (1,)
    axis_names: tuple = ("dp",)

    def validate(self) -> None:
        assert len(self.shape) == len(self.axis_names)
        assert all(s >= 1 for s in self.shape)

    def make(self):
        """Build a jax Mesh over the available devices."""
        import jax
        import numpy as np

        n = int(np.prod(self.shape))
        devs = jax.devices()[:n]
        assert len(devs) == n, f"need {n} devices, have {len(jax.devices())}"
        return jax.sharding.Mesh(
            np.asarray(devs).reshape(self.shape), self.axis_names)


@dataclass(frozen=True)
class KernelConfig:
    """TPU kernel tuning knobs."""

    msm_window_bits: int = 13      # signed Pippenger window (grid MSM)
    msm_backend: str = "pallas"    # "pallas" (TPU) | "xla" (portable)
    msm_limb15: bool = True        # 17x15-bit prefix kernels (curve/limb15.py)
    poseidon_tile_lanes: int = 1024
    compile_cache: bool = True

    def validate(self) -> None:
        assert 2 <= self.msm_window_bits <= 16
        assert self.msm_backend in ("pallas", "xla")
        assert self.poseidon_tile_lanes % 1024 == 0


@dataclass(frozen=True)
class Config:
    rlwe: RlweConfig = field(default_factory=RlweConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    kernel: KernelConfig = field(default_factory=KernelConfig)
    # informational field constants (validated, not overridable)
    fr_mod: int = bn254.FR_MOD
    fp_mod: int = bn254.FP_MOD

    def validate(self) -> "Config":
        self.rlwe.validate()
        self.mesh.validate()
        self.kernel.validate()
        assert self.fr_mod == bn254.FR_MOD and self.fp_mod == bn254.FP_MOD
        return self

    @classmethod
    def from_toml(cls, path: str) -> "Config":
        """Load overrides from a TOML file with [rlwe]/[mesh]/[kernel]
        tables; unspecified keys keep their defaults."""
        import tomllib

        with open(path, "rb") as f:
            data = tomllib.load(f)

        def build(klass, table):
            known = {f.name for f in dataclasses.fields(klass)}
            unknown = set(table) - known
            assert not unknown, f"unknown {klass.__name__} keys: {unknown}"
            fixed = {k: tuple(v) if isinstance(v, list) else v
                     for k, v in table.items()}
            return klass(**fixed)

        return cls(
            rlwe=build(RlweConfig, data.get("rlwe", {})),
            mesh=build(MeshConfig, data.get("mesh", {})),
            kernel=build(KernelConfig, data.get("kernel", {})),
        ).validate()


_config = Config()


def get_config() -> Config:
    return _config


def set_config(cfg: Config) -> Config:
    global _config
    _config = cfg.validate()
    return _config


def load_config(path: str) -> Config:
    return set_config(Config.from_toml(path))
