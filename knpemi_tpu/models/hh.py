"""Hodgkin-Huxley membrane model (V in volts, t in seconds).

The neuron channel model of the reference's idealized and astrocyte
drivers (examples/idealized_geometries/mm_hh.py): classic 1952
squid-axon gates in SI-shifted units plus

* Nernst potentials computed *inside the RHS* from the trace
  concentrations supplied by the PDE side (mm_hh.py:169-170),
* an Na/K exchanger pump i_pump = I_max / ((1 + m_K/K_e)^2 (1 + m_Na/Na_i)^3)
  (mm_hh.py:210),
* a synaptic stimulus conductance
  g_syn = stim_amplitude * exp(-mod(t, 0.03)/0.002) * [t < 125 ms]
  added to the Na conductance (mm_hh.py:208, 213).

State layout (m, h, n, V) and parameter names match the reference's
gotran layout so drivers can address them by name.
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
    "m_K",
    "m_Na",
    "I_max",
    "Cm",
    "stim_amplitude",
    "K_e",
    "K_i",
    "Na_e",
    "Na_i",
    "Cl_e",
    "Cl_i",
    "z_Na",
    "z_K",
    "z_Cl",
    "psi",
)

# Calibrated resting values (mm_hh.py:12-16)
DEFAULT_STATES = np.array(
    [
        0.016648440745822956,  # m
        0.8542015627820805,  # h
        0.1882020248041632,  # n
        -0.07438609374462003,  # V (volts)
    ]
)

# Membrane parameters in SI-area units (mm_hh.py:39-46)
DEFAULT_PARAMS = np.array(
    [
        1200.0,  # g_Na_bar  (S/m^2)
        360.0,  # g_K_bar
        1.0,  # g_leak_Na
        4.0,  # g_leak_K
        2.0,  # m_K   (mol/m^3)
        7.7,  # m_Na
        0.449,  # I_max (A/m^2)
        0.0,  # Cm (set from PDE params)
        0.0,  # stim_amplitude
        0.0,  # K_e (traces, set per step)
        0.0,  # K_i
        0.0,  # Na_e
        0.0,  # Na_i
        0.0,  # Cl_e
        0.0,  # Cl_i
        1.0,  # z_Na
        1.0,  # z_K
        -1.0,  # z_Cl
        0.0,  # psi (set from PDE params)
    ]
)

_P = {n: i for i, n in enumerate(PARAM_NAMES)}


def _gates(V):
    """HH rate functions; V in volts, rates in 1/s (the classic mV/ms rates
    scaled by 1e3 with the -65 mV resting shift)."""
    u = 1e3 * (V + 65.0e-3)  # membrane potential in shifted mV
    # stable x/(exp(x)-1) form: the raw expression is a 0/0 NaN window
    # at u = 25 / u = 10 in f32 (see models/rates.py)
    alpha_m = 1e3 * 0.1 * 10.0 * exprel_inv((25.0 - u) / 10.0)
    beta_m = 1e3 * 4.0 * jnp.exp(-u / 18.0)
    alpha_h = 1e3 * 0.07 * jnp.exp(-u / 20.0)
    beta_h = 1e3 / (jnp.exp((30.0 - u) / 10.0) + 1.0)
    alpha_n = 1e3 * 0.01 * 10.0 * exprel_inv((10.0 - u) / 10.0)
    beta_n = 1e3 * 0.125 * jnp.exp(-u / 80.0)
    return (alpha_m, beta_m), (alpha_h, beta_h), (alpha_n, beta_n)


def _ionic_currents(t, y, p):
    m, h, n, V = y[0], y[1], y[2], y[3]
    psi = p[_P["psi"]]
    z_Na = p[_P["z_Na"]]
    z_K = p[_P["z_K"]]
    E_Na = jnp.log(p[_P["Na_e"]] / p[_P["Na_i"]]) / (psi * z_Na)
    E_K = jnp.log(p[_P["K_e"]] / p[_P["K_i"]]) / (psi * z_K)
    g_syn = (
        p[_P["stim_amplitude"]]
        * jnp.exp(-jnp.mod(t, 0.03) / 0.002)
        * (t < 125.0e-3)
    )
    i_pump = p[_P["I_max"]] / (
        (1.0 + p[_P["m_K"]] / p[_P["K_e"]]) ** 2
        * (1.0 + p[_P["m_Na"]] / p[_P["Na_i"]]) ** 3
    )
    i_Na = (p[_P["g_leak_Na"]] + p[_P["g_Na_bar"]] * h * m**3 + g_syn) * (
        V - E_Na
    ) + 3.0 * i_pump
    i_K = (p[_P["g_leak_K"]] + p[_P["g_K_bar"]] * n**4) * (V - E_K) - 2.0 * i_pump
    i_Cl = jnp.zeros_like(i_Na)
    return i_Na, i_K, i_Cl


def rhs(t, y, p):
    m, h, n, V = y[0], y[1], y[2], y[3]
    (am, bm), (ah, bh), (an, bn) = _gates(V)
    dm = (1.0 - m) * am - m * bm
    dh = (1.0 - h) * ah - h * bh
    dn = (1.0 - n) * an - n * bn
    i_Na, i_K, i_Cl = _ionic_currents(t, y, p)
    dV = -(i_K + i_Na + i_Cl) / p[_P["Cm"]]
    return jnp.stack([dm, dh, dn, dV])


def currents(t, y, p):
    return _ionic_currents(t, y, p)


MODEL = register_model(
    ODEModel(
        name="hh",
        state_names=STATE_NAMES,
        param_names=PARAM_NAMES,
        default_states=DEFAULT_STATES,
        default_params=DEFAULT_PARAMS,
        rhs=rhs,
        currents=currents,
        current_names=("Na", "K", "Cl"),
    )
)


# ---------------------------------------------------------------------------
# mV/ms variant — the astrocyte-depolarization drivers' unit system
# (examples/local_astrocyte_depolarization/mm_hh.py: classic per-ms rates,
# V in mV, stimulus mod(t, 30)/2 with t in ms, t < 125 ms; calibrated
# resting state mm_hh.py:12-15; parameters in mS/cm^2, mm_hh.py:40-47).
# ---------------------------------------------------------------------------
DEFAULT_STATES_MV = np.array(
    [
        0.015211986965658385,  # m
        0.8667432624969533,  # h
        0.17994146133363148,  # n
        -75.09159534786934,  # V (mV)
    ]
)

DEFAULT_PARAMS_MV = DEFAULT_PARAMS.copy()
for _name, _v in dict(
    g_Na_bar=120.0,
    g_K_bar=36.0,
    g_leak_Na=0.1,
    g_leak_K=0.4,
    m_K=1.5,
    m_Na=10.0,
    I_max=58.0,
).items():
    DEFAULT_PARAMS_MV[_P[_name]] = _v


def _gates_mv(V):
    """Classic HH rates, V in mV, rates in 1/ms (astrocyte mm_hh.py:163-170).
    Algebraically identical to :func:`_gates` modulo the unit scaling."""
    # x/(1-exp(-x/10)) == 10 * exprel_inv(-x/10): stable at V = -40/-55
    alpha_m = 0.1 * 10.0 * exprel_inv(-(V + 40.0) / 10.0)
    beta_m = 4.0 * jnp.exp(-(V + 65.0) / 18.0)
    alpha_h = 0.07 * jnp.exp(-(V + 65.0) / 20.0)
    beta_h = 1.0 / (1.0 + jnp.exp(-(V + 35.0) / 10.0))
    alpha_n = 0.01 * 10.0 * exprel_inv(-(V + 55.0) / 10.0)
    beta_n = 0.125 * jnp.exp(-(V + 65.0) / 80.0)
    return (alpha_m, beta_m), (alpha_h, beta_h), (alpha_n, beta_n)


def _ionic_currents_mv(t, y, p):
    m, h, n, V = y[0], y[1], y[2], y[3]
    psi = p[_P["psi"]]
    E_Na = jnp.log(p[_P["Na_e"]] / p[_P["Na_i"]]) / (psi * p[_P["z_Na"]])
    E_K = jnp.log(p[_P["K_e"]] / p[_P["K_i"]]) / (psi * p[_P["z_K"]])
    g_syn = (
        p[_P["stim_amplitude"]]
        * jnp.exp(-jnp.mod(t, 30.0) / 2.0)
        * (t < 125.0)
    )
    i_pump = p[_P["I_max"]] / (
        (1.0 + p[_P["m_K"]] / p[_P["K_e"]]) ** 2
        * (1.0 + p[_P["m_Na"]] / p[_P["Na_i"]]) ** 3
    )
    i_Na = (p[_P["g_leak_Na"]] + p[_P["g_Na_bar"]] * h * m**3 + g_syn) * (
        V - E_Na
    ) + 3.0 * i_pump
    i_K = (p[_P["g_leak_K"]] + p[_P["g_K_bar"]] * n**4) * (V - E_K) - 2.0 * i_pump
    i_Cl = jnp.zeros_like(i_Na)
    return i_Na, i_K, i_Cl


def rhs_mv(t, y, p):
    m, h, n, V = y[0], y[1], y[2], y[3]
    (am, bm), (ah, bh), (an, bn) = _gates_mv(V)
    i_Na, i_K, i_Cl = _ionic_currents_mv(t, y, p)
    return jnp.stack(
        [
            (1.0 - m) * am - m * bm,
            (1.0 - h) * ah - h * bh,
            (1.0 - n) * an - n * bn,
            -(i_K + i_Na + i_Cl) / p[_P["Cm"]],
        ]
    )


def currents_mv(t, y, p):
    return _ionic_currents_mv(t, y, p)


MODEL_MV = register_model(
    ODEModel(
        name="hh_mv",
        state_names=STATE_NAMES,
        param_names=PARAM_NAMES,
        default_states=DEFAULT_STATES_MV,
        default_params=DEFAULT_PARAMS_MV,
        rhs=rhs_mv,
        currents=currents_mv,
        current_names=("Na", "K", "Cl"),
    )
)
