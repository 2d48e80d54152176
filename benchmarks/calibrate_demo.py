#!/usr/bin/env python
"""Gradient-based circuit calibration demo (the reverse-mode transient
adjoint in action, analysis/adjoint.py).

A "measured" waveform is produced by a hidden RC+diode circuit; we then
perturb the series R by +40% and the diode saturation current by 10x and
recover both by gradient descent on the waveform mismatch — every gradient is ONE adjoint backward pass over the
whole transient, regardless of how many parameters are being fit.

Usage: python benchmarks/calibrate_demo.py [STEPS=60]
(runs on CPU by default: calibration is a small-N, many-iteration loop)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    if os.environ.get("CALIB_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from circuitsimulator_tpu import Simulator, DEFAULT_OPTIONS
    from circuitsimulator_tpu.analysis.adjoint import diff_transient

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    net = """\
V1 in 0 SIN 0.4 0.3 2e6
R1 in a 1k
C1 a 0 100p
D1 a 0 IS=1e-13 N=1
.TRAN 5e-9 5e-7
"""
    opts = DEFAULT_OPTIONS.replace(dtype=jnp.float64, tran_solver="lu")
    sim = Simulator.from_text(net, opts=opts)
    a_eq = sim.circuit.nodes[sim.circuit.node_name_to_id["a"]].eq_index

    # "measurement" from the true parameters
    _, xs_true = jax.jit(
        lambda p: diff_transient(sim.engine, p, 5e-9, 5e-7))(sim.params)
    target = xs_true[:, a_eq]

    # detune: optimize log-parameters for positivity + natural step sizes
    theta0 = jnp.log(jnp.asarray([1e3 * 1.4, 1e-13 * 10.0]))

    @jax.jit
    def loss_and_grad(theta):
        def f(th):
            p = dict(sim.params)
            p["res_r"] = sim.params["res_r"].at[0].set(jnp.exp(th[0]))
            p["dio_is"] = sim.params["dio_is"].at[0].set(jnp.exp(th[1]))
            _, xs = diff_transient(sim.engine, p, 5e-9, 5e-7)
            return jnp.mean((xs[:, a_eq] - target) ** 2) * 1e6
        return jax.value_and_grad(f)(theta)

    import optax
    opt = optax.adam(optax.exponential_decay(0.25, n_iter, 0.05))
    opt_state = opt.init(theta0)
    theta = theta0
    for i in range(n_iter):
        val, g = loss_and_grad(theta)
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)
        if i % 10 == 0 or i == n_iter - 1:
            r, i_s = float(jnp.exp(theta[0])), float(jnp.exp(theta[1]))
            print(f"iter {i:3d}: loss {float(val):.3e}  "
                  f"R={r:.2f} (true 1000)  IS={i_s:.3e} (true 1e-13)",
                  file=sys.stderr)
    r, i_s = float(jnp.exp(theta[0])), float(jnp.exp(theta[1]))
    err_r = abs(r - 1e3) / 1e3
    err_c = abs(np.log10(i_s / 1e-13))   # decades off on IS
    import json
    print(json.dumps({
        "metric": "calibration_param_recovery_error",
        "value": round(max(err_r, err_c), 6),
        "unit": f"rel err after {n_iter} adjoint gradient steps "
                "(R + diode-IS recovery; lower is better)",
    }))


if __name__ == "__main__":
    main()
