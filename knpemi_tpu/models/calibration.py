"""Calibration ODE model: closed ECS + neuron + glial compartment system.

Equivalent of the reference's
examples/calibrate_initial_conditions/mm_calibration.py: a 14-state ODE
(HH gates m/h/n, membrane potentials V_n/V_g, and 9 compartment
concentrations) in which the channel/pump currents of both membranes
feed back into the concentrations through the compartment volume and
surface factors (mm_calibration.py:163-298).  Units mV / ms / cm / mM.

Used by examples/calibrate/run_calibration.py to find the dynamic
steady state whose values are hard-coded as initial conditions in the
PDE drivers (e.g. astrocyte run_stim_duration.py:232-242).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .rates import exprel_inv
from .registry import ODEModel, register_model

STATE_NAMES = (
    "m", "h", "n", "V_n", "V_g",
    "K_e", "K_n", "K_g",
    "Na_e", "Na_n", "Na_g",
    "Cl_e", "Cl_n", "Cl_g",
)
PARAM_NAMES = (
    "g_Na_bar", "g_K_bar",
    "g_leak_Na_n", "g_leak_K_n",
    "g_leak_Na_g", "g_leak_K_g",
    "Cm", "stim_amplitude",
    "m_K", "m_Na", "I_max_n", "I_max_g", "g_leak_Cl_g",
)

DEFAULT_STATES = np.array(
    [
        0.01365600905697864,  # m
        0.8804834256821714,  # h
        0.17041625484928405,  # n
        -75.93151471235473,  # V_n (mV)
        -85.85765274084892,  # V_g
        3.092970607490389,  # K_e
        124.13988964240784,  # K_n
        99.3100014897692,  # K_g
        144.60625137617149,  # Na_e
        12.850454639128186,  # Na_n
        15.775818906083778,  # Na_g
        133.62525154406637,  # Cl_e
        5.0,  # Cl_n
        5.203660274163705,  # Cl_g
    ]
)
DEFAULT_PARAMS = np.array(
    [120.0, 36.0, 0.1, 0.4, 0.1, 1.696, 1.0, 0.0, 1.5, 10.0, 58.0,
     10.75975, 0.05]
)

_S = {n: i for i, n in enumerate(STATE_NAMES)}
_P = {n: i for i, n in enumerate(PARAM_NAMES)}

# Physical constants and compartment geometry (mm_calibration.py:159-165)
RTF = 8.315e3 * 307e3 / 96500e3  # R*T/F in mV
F = 96500e3
ICS_VOL = 3.42e-11 / 2.0  # cm^3
ECS_VOL = 7.08e-11
SURFACE = 2.29e-6  # cm^2
K_E_INIT = 3.092970607490389
K_G_INIT = 99.3100014897692


def _currents_all(t, y, p):
    Vn, Vg = y[_S["V_n"]], y[_S["V_g"]]
    K_e, K_n, K_g = y[_S["K_e"]], y[_S["K_n"]], y[_S["K_g"]]
    Na_e, Na_n, Na_g = y[_S["Na_e"]], y[_S["Na_n"]], y[_S["Na_g"]]
    Cl_e, Cl_n, Cl_g = y[_S["Cl_e"]], y[_S["Cl_n"]], y[_S["Cl_g"]]

    E_Na_n = RTF * jnp.log(Na_e / Na_n)
    E_K_n = RTF * jnp.log(K_e / K_n)
    E_Na_g = RTF * jnp.log(Na_e / Na_g)
    E_K_g = RTF * jnp.log(K_e / K_g)
    E_Cl_g = -RTF * jnp.log(Cl_e / Cl_g)
    E_K_init = RTF * jnp.log(K_E_INIT / K_G_INIT)

    i_stim = p[_P["stim_amplitude"]] * jnp.exp(-jnp.mod(t, 20.0) / 2.0)
    i_pump_n = p[_P["I_max_n"]] / (
        (1 + p[_P["m_K"]] / K_e) ** 2 * (1 + p[_P["m_Na"]] / Na_n) ** 3
    )
    i_pump_g = (
        p[_P["I_max_g"]]
        * (K_e / (K_e + p[_P["m_K"]]))
        * (Na_g**1.5 / (Na_g**1.5 + p[_P["m_Na"]] ** 1.5))
    )

    dphi = Vg - E_K_g
    A = 1 + jnp.exp(18.4 / 42.4)
    B = 1 + jnp.exp(-(118.6 + E_K_init) / 44.1)
    C = 1 + jnp.exp((dphi + 18.5) / 42.5)
    D = 1 + jnp.exp(-(118.6 + Vg) / 44.1)
    g_Kir = jnp.sqrt(K_e / K_E_INIT) * (A * B) / (C * D)
    i_Kir = p[_P["g_leak_K_g"]] * g_Kir * (Vg - E_K_g)

    m, h, n = y[_S["m"]], y[_S["h"]], y[_S["n"]]
    i_Na_n = (
        p[_P["g_leak_Na_n"]] + p[_P["g_Na_bar"]] * h * m**3 + i_stim
    ) * (Vn - E_Na_n) + 3 * i_pump_n
    i_K_n = (p[_P["g_leak_K_n"]] + p[_P["g_K_bar"]] * n**4) * (
        Vn - E_K_n
    ) - 2 * i_pump_n
    i_Na_g = p[_P["g_leak_Na_g"]] * (Vg - E_Na_g) + 3 * i_pump_g
    i_K_g = i_Kir - 2 * i_pump_g
    i_Cl_g = p[_P["g_leak_Cl_g"]] * (Vg - E_Cl_g)
    i_Cl_n = jnp.zeros_like(i_Na_n)
    return i_Na_n, i_K_n, i_Cl_n, i_Na_g, i_K_g, i_Cl_g


def rhs(t, y, p):
    m, h, n, Vn = y[_S["m"]], y[_S["h"]], y[_S["n"]], y[_S["V_n"]]
    # stable x/(1-exp(-x/10)) form — 0/0 NaN window at Vn = -40/-55 in
    # f32 (see models/rates.py)
    alpha_m = 0.1 * 10.0 * exprel_inv(-(Vn + 40.0) / 10.0)
    beta_m = 4.0 * jnp.exp(-(Vn + 65.0) / 18.0)
    alpha_h = 0.07 * jnp.exp(-(Vn + 65.0) / 20.0)
    beta_h = 1.0 / (1.0 + jnp.exp(-(Vn + 35.0) / 10.0))
    alpha_n = 0.01 * 10.0 * exprel_inv(-(Vn + 55.0) / 10.0)
    beta_n = 0.125 * jnp.exp(-(Vn + 65.0) / 80.0)

    i_Na_n, i_K_n, i_Cl_n, i_Na_g, i_K_g, i_Cl_g = _currents_all(t, y, p)
    Cm = p[_P["Cm"]]
    se = SURFACE / (F * ECS_VOL)
    si = SURFACE / (F * ICS_VOL)
    return jnp.stack(
        [
            (1 - m) * alpha_m - m * beta_m,
            (1 - h) * alpha_h - h * beta_h,
            (1 - n) * alpha_n - n * beta_n,
            -(i_K_n + i_Na_n + i_Cl_n) / Cm,
            -(i_K_g + i_Na_g + i_Cl_g) / Cm,
            (i_K_n + i_K_g) * se,  # K_e
            -i_K_n * si,  # K_n
            -i_K_g * si,  # K_g
            (i_Na_n + i_Na_g) * se,  # Na_e
            -i_Na_n * si,  # Na_n
            -i_Na_g * si,  # Na_g
            -(i_Cl_n + i_Cl_g) * se,  # Cl_e
            i_Cl_n * si,  # Cl_n
            i_Cl_g * si,  # Cl_g
        ]
    )


def currents(t, y, p):
    i_Na_n, i_K_n, i_Cl_n, *_ = _currents_all(t, y, p)
    return i_Na_n, i_K_n, i_Cl_n


MODEL = register_model(
    ODEModel(
        name="calibration",
        state_names=STATE_NAMES,
        param_names=PARAM_NAMES,
        default_states=DEFAULT_STATES,
        default_params=DEFAULT_PARAMS,
        rhs=rhs,
        currents=currents,
        current_names=("Na", "K", "Cl"),
    )
)
