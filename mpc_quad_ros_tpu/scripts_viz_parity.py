"""Figure-level Visualiser parity check (VERDICT r2 item 8).

Renders OUR report / 3D / RGP-evolution figures and the REFERENCE's own
`Visualiser.plot_data` report side-by-side from the SAME reference pickle
into `outputs/viz_parity/`, so a human can diff the two reports panel by
panel.  The reference pickle is a real reference gp2 run with the full RGP
posterior history (`traj2_v10_a10_gp2.pkl`).

The reference Visualiser needs `pyquaternion` (absent here) only for
quaternion helpers unused by `plot_data`; a minimal stand-in module is
injected so THEIR code renders THEIR figure — nothing is copied.

    python -m mpc_quad_ros_tpu.scripts_viz_parity [--out outputs/viz_parity]
"""

from __future__ import annotations

import argparse
import os
import sys
import types

REF_PKL = "/root/reference/outputs/python_simulation/data/traj2_v10_a10_gp2.pkl"


def render_ours(pkl: str, out_dir: str) -> list[str]:
    import matplotlib

    matplotlib.use("Agg")
    from .io.viz import Visualiser

    viz = Visualiser.from_file(pkl)
    paths = []
    for name, fn in (("ours_report.png", viz.plot_data),
                     ("ours_3d.png", viz.plot_3d),
                     ("ours_rgp_evolution.png", viz.plot_rgp_evolution)):
        p = os.path.join(out_dir, name)
        try:
            fn(save_path=p)
            paths.append(p)
        except Exception as e:  # pragma: no cover - report, don't die
            print(f"[viz_parity] {name} failed: {type(e).__name__}: {e}")
    return paths


def render_reference(pkl: str, out_dir: str) -> list[str]:
    """Run the reference's own Visualiser.plot_data on the same pickle."""
    import matplotlib

    matplotlib.use("Agg")

    # plot_data never touches the quaternion/CasADi helpers; the modules
    # just need to import (reference utils.py:20-22 imports unconditionally)
    # ("config" is the reference's own dead import — utils.py:30 pulls a
    # module that does not exist in the reference tree either, SURVEY §5.6)
    for mod in ("pyquaternion", "casadi", "rospy", "config",
                "config.configuration_parameters"):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)

            def _missing(*a, _m=mod, **k):  # pragma: no cover
                raise NotImplementedError(f"{_m} stub")

            stub.__getattr__ = lambda name, _f=_missing: _f
            sys.modules[mod] = stub

    sys.path.insert(0, "/root/reference/src")
    try:
        from Visualiser import Visualiser as RefVisualiser

        viz = RefVisualiser(trajectory_filename=pkl)
        out = os.path.join(out_dir, "reference_report.pdf")
        viz.plot_data(out, show=False, save=True)
        return [out]
    except Exception as e:
        print(f"[viz_parity] reference render failed: {type(e).__name__}: {e}")
        return []
    finally:
        sys.path.remove("/root/reference/src")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pkl", default=REF_PKL)
    ap.add_argument("--out", default="outputs/viz_parity")
    a = ap.parse_args(argv)
    os.makedirs(a.out, exist_ok=True)
    ours = render_ours(a.pkl, a.out)
    ref = render_reference(a.pkl, a.out)
    print(f"rendered: {ours + ref}")
    return 0 if ours else 1


if __name__ == "__main__":
    raise SystemExit(main())
