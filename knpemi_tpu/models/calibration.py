"""Calibration ODE model (closed ECS+neuron+glial system) — see
examples/calibrate_initial_conditions in the reference.  Implemented in
:mod:`knpemi_tpu.models.calibration_impl` milestone M6; imported lazily by
the registry."""
