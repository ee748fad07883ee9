"""hello_world demo (reference `hello_world.py:14-23` parity: takeoff, hover,
land — here flown by the MPC through the node seam) and the RGP-posterior
animation writer (`Visualiser.py:459-670` parity)."""

import numpy as np


def test_hello_world_takeoff_land():
    from mpc_quad_ros_tpu.hello_world import hello_world

    res = hello_world(height=1.0, hover_s=0.0, quad="crazyflie", verbose=False)
    assert res["takeoff"]["error_m"] < 0.05
    assert res["land"]["error_m"] < 0.05
    assert res["takeoff"]["x_final"][2] > 0.9
    assert res["land"]["x_final"][2] < 0.1


def test_rgp_animation_writes_gif(tmp_path):
    from mpc_quad_ros_tpu.io.viz import Visualiser

    T, nb = 24, 8
    rng = np.random.default_rng(0)
    viz = Visualiser({
        "rgp_mu_g_t": rng.normal(size=(T, 3, nb)) * 0.1,
        "v_body": rng.normal(size=(T, 3)),
        "a_drag": rng.normal(size=(T, 3)) * 0.5,
        "rgp_basis_vectors": np.tile(np.linspace(-3, 3, nb), (3, 1)),
    })
    out = tmp_path / "rgp.gif"
    viz.create_rgp_animation(str(out), fps=5, stride=8)
    assert out.exists() and out.stat().st_size > 0
