"""The ODE zoo: seven paper systems (reference systems.py:80-288).

Vector fields are written with ``jnp.stack`` (single fused expression)
rather than sequential ``.at[].set`` updates — identical math, friendlier
to vmap/XLA.
"""

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.systems.base import ODE


class FHNODE(ODE):
    """FitzHugh-Nagumo ODE (reference systems.py:80-106)."""

    def __init__(self, **kwargs):
        mn, mx = np.array([[-2.0, -1.0], [2.1, 1.2]])
        super().__init__("FHN_ODE", mn, mx, np.array([-1.0, 1.0]), **kwargs)

    @staticmethod
    def _f(t, u):
        a, b, c = 0.2, 0.2, 3.0
        return jnp.stack(
            [
                c * (u[0] - (u[0] ** 3) / 3.0 + u[1]),
                -(1.0 / c) * (u[0] - a + b * u[1]),
            ]
        )


class Rossler(ODE):
    """Rossler attractor (reference systems.py:109-137)."""

    def __init__(self, **kwargs):
        mn, mx = np.array([[-10.0, -11.0, 0.0], [12.0, 8.0, 23.0]])
        super().__init__("Rossler", mn, mx, np.array([0.0, -6.78, 0.02]), **kwargs)

    @staticmethod
    def _f(t, u):
        a, b, c = 0.2, 0.2, 5.7
        return jnp.stack(
            [
                -u[1] - u[2],
                u[0] + a * u[1],
                b + u[2] * (u[0] - c),
            ]
        )


class Hopf(ODE):
    """Non-autonomous Hopf bifurcation; time is the third state coordinate
    (reference systems.py:140-172). ``maxtime`` = tspan[1]."""

    def __init__(self, tspan=(-20.0, 500.0), **kwargs):
        mn, mx = np.array([[-23.0, -23.0, 0.0], [23.0, 23.0, 1.0]])
        self.maxtime = float(tspan[1])
        u0 = np.array([0.1, 0.1, float(tspan[0])])
        super().__init__("Hopf", mn, mx, u0, **kwargs)

    def _f(self, t, u):
        mu = u[2] / self.maxtime - u[0] ** 2 - u[1] ** 2
        return jnp.stack(
            [
                -u[1] + u[0] * mu,
                u[0] + u[1] * mu,
                jnp.ones_like(u[0]),
            ]
        )


class DblPend(ODE):
    """Planar double pendulum (reference systems.py:175-199)."""

    def __init__(self, **kwargs):
        mn, mx = np.array([[-2.0, -2.5, -17.0, -3.5], [2.0, 2.5, 1.0, 3.5]])
        super().__init__("DblPend", mn, mx, np.array([-0.5, 0.0, 0.0, 0.0]), **kwargs)

    @staticmethod
    def _f(t, u):
        dq = u[0] - u[2]
        cd, sd = jnp.cos(dq), jnp.sin(dq)
        den = -1.0 / (2.0 - cd ** 2)
        d1 = den * (
            u[1] ** 2 * cd * sd
            + u[3] ** 2 * sd
            + 2.0 * jnp.sin(u[0])
            - cd * jnp.sin(u[2])
        )
        d3 = den * (
            -2.0 * u[1] ** 2 * sd
            - u[3] ** 2 * sd * cd
            - 2.0 * cd * jnp.sin(u[0])
            + 2.0 * jnp.sin(u[2])
        )
        return jnp.stack([u[1], d1, u[3], d3])


class Brusselator(ODE):
    """Brusselator reaction (reference systems.py:202-222)."""

    def __init__(self, **kwargs):
        mn, mx = np.array([[0.4, 0.9], [4.0, 5.0]])
        super().__init__("Brusselator", mn, mx, np.array([1.0, 3.07]), **kwargs)

    @staticmethod
    def _f(t, u):
        return jnp.stack(
            [
                1.0 + u[0] ** 2 * u[1] - 4.0 * u[0],
                3.0 * u[0] - u[0] ** 2 * u[1],
            ]
        )


class Lorenz(ODE):
    """Lorenz '63 (reference systems.py:225-247)."""

    def __init__(self, **kwargs):
        mn, mx = np.array([[-17.1, -23.0, 6.0], [18.1, 25.0, 45.0]])
        super().__init__("Lorenz", mn, mx, np.array([-15.0, -15.0, 20.0]), **kwargs)

    @staticmethod
    def _f(t, u):
        return jnp.stack(
            [
                10.0 * (u[1] - u[0]),
                28.0 * u[0] - u[1] - u[0] * u[2],
                u[0] * u[1] - (8.0 / 3.0) * u[2],
            ]
        )


class ThomasLabyrinth(ODE):
    """Thomas' cyclically symmetric attractor (reference systems.py:250-288)."""

    def __init__(self, **kwargs):
        mn, mx = np.array([[-12.0, -12.0, -12.0], [12.0, 12.0, 12.0]])
        u0 = np.array([4.6722764, 5.2437205e-10, -6.4444208e-10])
        super().__init__("ThomasLabyrinth", mn, mx, u0, **kwargs)

    @staticmethod
    def _f(t, u):
        a, b = 0.5, 10.0
        return jnp.stack(
            [
                -a * u[0] + b * jnp.sin(u[1]),
                -a * u[1] + b * jnp.sin(u[2]),
                -a * u[2] + b * jnp.sin(u[0]),
            ]
        )
