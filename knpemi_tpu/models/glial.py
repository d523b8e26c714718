"""Glial (astrocyte) membrane model: inward-rectifying K (Kir) + leaks + pump.

The glial channel model of the reference's benchmark and astrocyte drivers
(examples/local_astrocyte_depolarization/mm_glial.py, copy at
examples/benchmark/mm_glial.py): a single-state (V) model in the
millivolt/millisecond unit system of those drivers (temperature 307e3 mK,
R 8.315e3, F 96500e3, C_M 1.0; astrocyte run_stim_duration.py:221-228):

* Kir conductance with the sqrt(K_e / K_e_init) Boltzmann form
  (mm_glial.py:176-187 of the astrocyte copy),
* Na leak + Na/K exchanger pump
  i_pump = I_max (K_e/(K_e+m_K)) (Na_i^1.5/(Na_i^1.5+m_Na^1.5)),
* Cl leak.

The Nernst prefactor is 1/psi with psi pushed in from the PDE parameters
(the reference hard-codes R*T/F = 26.45 mV inside the RHS with the same
numerical value, mm_glial.py:168-179).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .registry import ODEModel, register_model

STATE_NAMES = ("V",)
PARAM_NAMES = (
    "g_leak_Cl",
    "g_leak_Na",
    "g_leak_K",
    "Cm",
    "stim_amplitude",
    "m_K",
    "m_Na",
    "I_max",
    "K_e_init",
    "K_i_init",
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

# Resting V (mV) and channel parameters (astrocyte mm_glial.py:11, 36-46)
DEFAULT_STATES = np.array([-85.84503411546689])
DEFAULT_PARAMS = np.array(
    [
        0.05,  # g_leak_Cl (mS/cm^2)
        0.1,  # g_leak_Na
        1.696,  # g_leak_K
        0.0,  # Cm (set from PDE params)
        0.0,  # stim_amplitude
        1.5,  # m_K  (mol/m^3)
        10.0,  # m_Na
        10.75975,  # I_max (uA/cm^2)
        3.092970607490389,  # K_e_init
        99.3100014897692,  # K_i_init
        0.0,  # K_e (traces, set per step)
        0.0,  # K_i
        0.0,  # Na_e
        0.0,  # Na_i
        0.0,  # Cl_e
        0.0,  # Cl_i
        1.0,  # z_Na
        1.0,  # z_K
        -1.0,  # z_Cl
        0.0,  # psi (set from PDE params; 1/psi ~ 26.45 mV)
    ]
)

_P = {n: i for i, n in enumerate(PARAM_NAMES)}


def _ionic_currents(t, y, p):
    V = y[0]
    psi = p[_P["psi"]]
    K_e, K_i = p[_P["K_e"]], p[_P["K_i"]]
    Na_e, Na_i = p[_P["Na_e"]], p[_P["Na_i"]]
    Cl_e, Cl_i = p[_P["Cl_e"]], p[_P["Cl_i"]]
    E_Na = jnp.log(Na_e / Na_i) / (psi * p[_P["z_K"]])
    E_K = jnp.log(K_e / K_i) / (psi * p[_P["z_K"]])
    E_Cl = jnp.log(Cl_e / Cl_i) / (psi * p[_P["z_Cl"]])

    i_pump = (
        p[_P["I_max"]]
        * (K_e / (K_e + p[_P["m_K"]]))
        * (Na_i**1.5 / (Na_i**1.5 + p[_P["m_Na"]] ** 1.5))
    )

    # Kir rectification (astrocyte mm_glial.py:176-187), mV constants
    K_e_init = p[_P["K_e_init"]]
    K_i_init = p[_P["K_i_init"]]
    E_K_init = jnp.log(K_e_init / K_i_init) / psi
    dphi = V - E_K
    A = 1.0 + jnp.exp(18.5 / 42.4)
    B = 1.0 + jnp.exp(-(118.6 + E_K_init) / 44.1)
    C = 1.0 + jnp.exp((dphi + 18.5) / 42.4)
    D = 1.0 + jnp.exp(-(118.6 + V) / 44.1)
    g_Kir = jnp.sqrt(K_e / K_e_init) * (A * B) / (C * D)

    i_Kir = p[_P["g_leak_K"]] * g_Kir * (V - E_K)
    i_Na = p[_P["g_leak_Na"]] * (V - E_Na) + 3.0 * i_pump
    i_K = i_Kir - 2.0 * i_pump
    i_Cl = p[_P["g_leak_Cl"]] * (V - E_Cl)
    return i_Na, i_K, i_Cl


def rhs(t, y, p):
    i_Na, i_K, i_Cl = _ionic_currents(t, y, p)
    dV = -(i_K + i_Na + i_Cl) / p[_P["Cm"]]
    return jnp.stack([dV])


def currents(t, y, p):
    return _ionic_currents(t, y, p)


MODEL = register_model(
    ODEModel(
        name="glial",
        state_names=STATE_NAMES,
        param_names=PARAM_NAMES,
        default_states=DEFAULT_STATES,
        default_params=DEFAULT_PARAMS,
        rhs=rhs,
        currents=currents,
        current_names=("Na", "K", "Cl"),
    )
)
