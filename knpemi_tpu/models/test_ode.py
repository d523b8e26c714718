"""Standalone HH fixture model (mV units, fixed Nernst potentials).

Equivalent of the reference's tests/mm_test_ode.py: the classic HH
squid-axon model in mV with *constant* (parameter) Nernst potentials and
an Na/K pump — used for membrane-only ODE tests where no PDE supplies
trace concentrations (mm_test_ode.py:36-58, 139-169).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .rates import exprel_inv
from .registry import ODEModel, register_model

STATE_NAMES = ("m", "h", "n", "V")
PARAM_NAMES = (
    "g_Na_bar",
    "g_K_bar",
    "g_leak_Na",
    "g_leak_K",
    "E_Na",
    "E_K",
    "Cm",
    "stim_amplitude",
    "K_e",
    "Na_i",
    "m_K",
    "m_Na",
    "I_max",
    "E_Cl",
)

DEFAULT_STATES = np.array(
    [
        0.016648440745822956,  # m
        0.8542015627820805,  # h
        0.1882020248041632,  # n
        -74.38609374462003,  # V (mV)
    ]
)

DEFAULT_PARAMS = np.array(
    [
        120.0,  # g_Na_bar (mS/cm^2)
        36.0,  # g_K_bar
        0.1,  # g_leak_Na
        0.4,  # g_leak_K
        53.23236322443255,  # E_Na (mV)
        -93.46115007798299,  # E_K
        1.0,  # Cm
        0.0,  # stim_amplitude
        3.32,  # K_e
        12.83,  # Na_i
        2.0,  # m_K
        7.7,  # m_Na
        50.0,  # I_max
        70.97802159265801,  # E_Cl
    ]
)

_P = {n: i for i, n in enumerate(PARAM_NAMES)}


def _gates(V):
    u = V + 65.0
    # stable x/(exp(x)-1) form — 0/0 NaN window at u = 25/10 in f32
    # (see models/rates.py)
    alpha_m = 0.1 * 10.0 * exprel_inv((25.0 - u) / 10.0)
    beta_m = 4.0 * jnp.exp(-u / 18.0)
    alpha_h = 0.07 * jnp.exp(-u / 20.0)
    beta_h = 1.0 / (jnp.exp((30.0 - u) / 10.0) + 1.0)
    alpha_n = 0.01 * 10.0 * exprel_inv((10.0 - u) / 10.0)
    beta_n = 0.125 * jnp.exp(-u / 80.0)
    return (alpha_m, beta_m), (alpha_h, beta_h), (alpha_n, beta_n)


def _ionic_currents(t, y, p):
    m, h, n, V = y[0], y[1], y[2], y[3]
    g_syn = (
        p[_P["stim_amplitude"]] * jnp.exp(-jnp.mod(t, 0.03) / 0.002) * (t < 125.0)
    )
    i_pump = p[_P["I_max"]] / (
        (1.0 + p[_P["m_K"]] / p[_P["K_e"]]) ** 2
        * (1.0 + p[_P["m_Na"]] / p[_P["Na_i"]]) ** 3
    )
    i_Na = (p[_P["g_leak_Na"]] + p[_P["g_Na_bar"]] * h * m**3 + g_syn) * (
        V - p[_P["E_Na"]]
    ) + 3.0 * i_pump
    i_K = (p[_P["g_leak_K"]] + p[_P["g_K_bar"]] * n**4) * (
        V - p[_P["E_K"]]
    ) - 2.0 * i_pump
    i_Cl = jnp.zeros_like(i_Na)
    return i_Na, i_K, i_Cl


def rhs(t, y, p):
    m, h, n, V = y[0], y[1], y[2], y[3]
    (am, bm), (ah, bh), (an, bn) = _gates(V)
    i_Na, i_K, i_Cl = _ionic_currents(t, y, p)
    return jnp.stack(
        [
            (1.0 - m) * am - m * bm,
            (1.0 - h) * ah - h * bh,
            (1.0 - n) * an - n * bn,
            -(i_K + i_Na + i_Cl) / p[_P["Cm"]],
        ]
    )


def currents(t, y, p):
    return _ionic_currents(t, y, p)


MODEL = register_model(
    ODEModel(
        name="hh_fixture",
        state_names=STATE_NAMES,
        param_names=PARAM_NAMES,
        default_states=DEFAULT_STATES,
        default_params=DEFAULT_PARAMS,
        rhs=rhs,
        currents=currents,
        current_names=("Na", "K", "Cl"),
    )
)
