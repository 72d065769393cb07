"""Policy / value / discriminator / encoder networks (flax.linen).

Capability-parity with the reference network builders
(``ase/learning/amp_network_builder.py``, ``ase_network_builder.py``,
``hrl_network_builder.py``), re-expressed as flax modules:

* AMP: separate actor/critic MLP towers + discriminator MLP with a ±1-uniform
  initialized logit layer;
* ASE: actor = style network (latent → [512,256] → tanh style vector,
  ±1-uniform output layer) concatenated with obs into the main MLP; critic on
  obs⊕z; encoder sharing the discriminator trunk with a ±0.1-uniform head and
  L2-normalized output;
* HRL: plain actor/critic MLP whose action space is the LLC latent.

Initializers reproduce the reference's torch defaults: Linear weights
U(±1/√fan_in) ("default"), fixed log-σ parameter from sigma_init.val.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_default_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class MLP(nn.Module):
    units: Sequence[int]
    activation: str = "relu"
    dtype: Any = None  # compute dtype (bf16 under mixed precision); params f32

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for u in self.units:
            x = act(nn.Dense(u, kernel_init=torch_default_init,
                             bias_init=nn.initializers.zeros,
                             dtype=self.dtype)(x))
        return x


class AMPNetwork(nn.Module):
    """Actor + critic + discriminator (reference AMPBuilder.Network)."""

    actions_num: int
    units: Sequence[int]
    disc_units: Sequence[int]
    activation: str = "relu"
    sigma_init_val: float = -2.9
    value_size: int = 1
    dtype: Any = None  # bf16 compute under mixed precision; heads return f32

    def setup(self):
        self.actor_mlp = MLP(self.units, self.activation, dtype=self.dtype,
                             name="actor_mlp")
        self.critic_mlp = MLP(self.units, self.activation, dtype=self.dtype,
                              name="critic_mlp")
        self.mu = nn.Dense(self.actions_num, kernel_init=torch_default_init,
                           bias_init=nn.initializers.zeros, dtype=self.dtype,
                           name="mu")
        self.value = nn.Dense(self.value_size, kernel_init=torch_default_init,
                              bias_init=nn.initializers.zeros, dtype=self.dtype,
                              name="value")
        self.sigma = self.param(
            "sigma", nn.initializers.constant(self.sigma_init_val), (self.actions_num,)
        )
        self.disc_mlp = MLP(self.disc_units, self.activation, dtype=self.dtype,
                            name="disc_mlp")
        self.disc_logits = nn.Dense(1, kernel_init=uniform_init(1.0),
                                    bias_init=nn.initializers.zeros,
                                    dtype=self.dtype, name="disc_logits")

    def eval_actor(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a = self.actor_mlp(obs)
        mu = self.mu(a).astype(jnp.float32)
        sigma = jnp.broadcast_to(self.sigma, mu.shape)
        return mu, sigma

    def eval_critic(self, obs) -> jnp.ndarray:
        return self.value(self.critic_mlp(obs)).astype(jnp.float32)

    def eval_disc(self, amp_obs) -> jnp.ndarray:
        return self.disc_logits(self.disc_mlp(amp_obs)).astype(jnp.float32)

    def __call__(self, obs, amp_obs):
        mu, sigma = self.eval_actor(obs)
        return mu, sigma, self.eval_critic(obs), self.eval_disc(amp_obs)


class StyleNet(nn.Module):
    """Latent → tanh style vector (reference AMPStyleCatNet1.eval_style)."""

    style_units: Sequence[int]
    style_dim: int
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        act = getattr(nn, self.activation)
        h = z
        for u in self.style_units:
            h = act(nn.Dense(u, kernel_init=torch_default_init,
                             bias_init=nn.initializers.zeros,
                             dtype=self.dtype)(h))
        style = nn.Dense(self.style_dim, kernel_init=uniform_init(1.0),
                         bias_init=nn.initializers.zeros, dtype=self.dtype)(h)
        return jnp.tanh(style)


class ASENetwork(nn.Module):
    """Latent-conditioned actor/critic + disc + enc (reference ASEBuilder.Network)."""

    actions_num: int
    latent_dim: int
    units: Sequence[int]
    disc_units: Sequence[int]
    enc_units: Sequence[int]
    enc_separate: bool = False
    style_units: Sequence[int] = (512, 256)
    activation: str = "relu"
    sigma_init_val: float = -2.9
    value_size: int = 1
    dtype: Any = None  # bf16 compute under mixed precision; heads return f32

    def setup(self):
        self.style_net = StyleNet(self.style_units, self.latent_dim,
                                  self.activation, dtype=self.dtype,
                                  name="style_net")
        self.actor_mlp = MLP(self.units, self.activation, dtype=self.dtype,
                             name="actor_mlp")
        self.critic_mlp = MLP(self.units, self.activation, dtype=self.dtype,
                              name="critic_mlp")
        self.mu = nn.Dense(self.actions_num, kernel_init=torch_default_init,
                           bias_init=nn.initializers.zeros, dtype=self.dtype,
                           name="mu")
        self.value = nn.Dense(self.value_size, kernel_init=torch_default_init,
                              bias_init=nn.initializers.zeros, dtype=self.dtype,
                              name="value")
        self.sigma = self.param(
            "sigma", nn.initializers.constant(self.sigma_init_val), (self.actions_num,)
        )
        self.disc_mlp = MLP(self.disc_units, self.activation, dtype=self.dtype,
                            name="disc_mlp")
        self.disc_logits = nn.Dense(1, kernel_init=uniform_init(1.0),
                                    bias_init=nn.initializers.zeros,
                                    dtype=self.dtype, name="disc_logits")
        if self.enc_separate:
            self.enc_mlp = MLP(self.enc_units, self.activation, dtype=self.dtype,
                               name="enc_mlp")
        self.enc_head = nn.Dense(self.latent_dim, kernel_init=uniform_init(0.1),
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.dtype, name="enc_head")

    def eval_actor(self, obs, ase_latents) -> Tuple[jnp.ndarray, jnp.ndarray]:
        style = self.style_net(ase_latents)
        h = jnp.concatenate([obs, style], axis=-1)
        h = self.actor_mlp(h)
        mu = self.mu(h).astype(jnp.float32)
        sigma = jnp.broadcast_to(self.sigma, mu.shape)
        return mu, sigma

    def eval_critic(self, obs, ase_latents) -> jnp.ndarray:
        h = jnp.concatenate([obs, ase_latents], axis=-1)
        return self.value(self.critic_mlp(h)).astype(jnp.float32)

    def eval_disc(self, amp_obs) -> jnp.ndarray:
        return self.disc_logits(self.disc_mlp(amp_obs)).astype(jnp.float32)

    def eval_enc(self, amp_obs) -> jnp.ndarray:
        trunk = self.enc_mlp(amp_obs) if self.enc_separate else self.disc_mlp(amp_obs)
        out = self.enc_head(trunk).astype(jnp.float32)
        norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out / jnp.maximum(norm, 1e-8)

    def __call__(self, obs, ase_latents, amp_obs):
        mu, sigma = self.eval_actor(obs, ase_latents)
        v = self.eval_critic(obs, ase_latents)
        return mu, sigma, v, self.eval_disc(amp_obs), self.eval_enc(amp_obs)


class HRLNetwork(nn.Module):
    """High-level controller over the latent space (reference HRLBuilder)."""

    actions_num: int  # = latent_dim
    units: Sequence[int]
    activation: str = "relu"
    sigma_init_val: float = -2.3
    value_size: int = 1
    dtype: Any = None

    def setup(self):
        self.actor_mlp = MLP(self.units, self.activation, dtype=self.dtype,
                             name="actor_mlp")
        self.critic_mlp = MLP(self.units, self.activation, dtype=self.dtype,
                              name="critic_mlp")
        self.mu = nn.Dense(self.actions_num, kernel_init=torch_default_init,
                           bias_init=nn.initializers.zeros, dtype=self.dtype,
                           name="mu")
        self.value = nn.Dense(self.value_size, kernel_init=torch_default_init,
                              bias_init=nn.initializers.zeros, dtype=self.dtype,
                              name="value")
        self.sigma = self.param(
            "sigma", nn.initializers.constant(self.sigma_init_val), (self.actions_num,)
        )

    def eval_actor(self, obs):
        h = self.actor_mlp(obs)
        mu = self.mu(h).astype(jnp.float32)
        sigma = jnp.broadcast_to(self.sigma, mu.shape)
        return mu, sigma

    def eval_critic(self, obs):
        return self.value(self.critic_mlp(obs)).astype(jnp.float32)

    def __call__(self, obs):
        mu, sigma = self.eval_actor(obs)
        return mu, sigma, self.eval_critic(obs)


def sample_latents(rng: jnp.ndarray, n: int, latent_dim: int) -> jnp.ndarray:
    """Uniform on the unit hypersphere (reference ase_network_builder.py:221-225)."""
    z = jax.random.normal(rng, (n, latent_dim))
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)


def _compute_dtype(params: Dict[str, Any]):
    """Mixed precision (bf16 matmuls, f32 master weights & heads): on via
    cfg_train config.mixed_precision or ASE_TPU_BF16=1. The MXU runs bf16 at
    ~4x f32 throughput; heads/log-probs/losses stay f32."""
    import os

    mp = params.get("config", {}).get("mixed_precision", None)
    if mp is None:
        mp = os.environ.get("ASE_TPU_BF16", "0") == "1"
    return jnp.bfloat16 if mp else None


def build_network(name: str, params: Dict[str, Any], obs_dim: int, act_dim: int,
                  amp_obs_dim: int = 0, latent_dim: int = 0):
    """Network registry keyed by the cfg_train ``network.name`` field."""
    net = params["network"]
    units = tuple(net["mlp"]["units"])
    sigma_val = float(net["space"]["continuous"]["sigma_init"]["val"])
    dtype = _compute_dtype(params)
    if name == "amp":
        return AMPNetwork(
            actions_num=act_dim, units=units,
            disc_units=tuple(net["disc"]["units"]), sigma_init_val=sigma_val,
            dtype=dtype,
        )
    if name == "ase":
        return ASENetwork(
            actions_num=act_dim, latent_dim=latent_dim, units=units,
            disc_units=tuple(net["disc"]["units"]),
            enc_units=tuple(net["enc"]["units"]),
            enc_separate=bool(net["enc"].get("separate", False)),
            sigma_init_val=sigma_val,
            dtype=dtype,
        )
    if name == "hrl":
        return HRLNetwork(actions_num=act_dim, units=units, sigma_init_val=sigma_val,
                          dtype=dtype)
    raise ValueError(f"unknown network {name}")
