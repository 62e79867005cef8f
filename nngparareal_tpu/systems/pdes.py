"""Discretised PDE systems (reference systems.py:291-577).

Finite-difference operators are assembled on the host in numpy (f64) and
captured as dense jnp constants. Under vmap over time slices, the matvecs
in these vector fields become (B, d) @ (d, d) matmuls — the MXU hot path
of the fine solve.
"""

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.systems.base import ODE


def _periodic_second_diff(n, h):
    """(1/h^2) * tridiag(1, -2, 1) with periodic wrap."""
    T = -2.0 * np.eye(n)
    idx = np.arange(n - 1)
    T[idx, idx + 1] = 1.0
    T[idx + 1, idx] = 1.0
    T[0, -1] = 1.0
    T[-1, 0] = 1.0
    return T / (h * h)


def _periodic_first_diff(n, h):
    """(1/2h) * tridiag(-1, 0, 1) with periodic wrap."""
    T = np.zeros((n, n))
    idx = np.arange(n - 1)
    T[idx, idx + 1] = 1.0
    T[idx + 1, idx] = -1.0
    T[0, -1] = -1.0
    T[-1, 0] = 1.0
    return T / (2.0 * h)


class FHNPDE(ODE):
    """FitzHugh-Nagumo 2-species 2D reaction-diffusion PDE, periodic BC,
    d = 2*dx*dy (reference systems.py:291-398). The initial condition
    reproduces the reference's legacy-seeded numpy draw
    (systems.py:303-316) bit-for-bit.

    TPU-native: the reference applies the Laplacian as a dense Kronecker
    matvec (systems.py:322-353). Here it is a 5-point periodic stencil via
    jnp.roll on the (d_y, d_x) grid — pure VPU work that vmaps over time
    slices without any f64 matmul emulation. ``dense_laplacian()`` exposes
    the reference operator as a test oracle."""

    def __init__(self, d_x, seed=45, **kwargs):
        self.d_x = int(d_x)
        self.d_y = int(d_x)
        d = 2 * self.d_x * self.d_y
        self.d = d

        self._hx2 = (2.0 / (self.d_x - 1)) ** 2
        self._hy2 = (2.0 / (self.d_y - 1)) ** 2

        mn, mx = np.array([[-1.0] * d, [1.0] * d])

        # legacy bit-generator shim: reference seeds the *global* numpy RNG
        # then wraps its bit generator (systems.py:303-316)
        np.random.seed(seed)
        if hasattr(np.random, "get_bit_generator"):
            rng = np.random.Generator(np.random.get_bit_generator())
        else:  # pragma: no cover
            rng = np.random.default_rng(seed)
        u0 = rng.uniform(size=d)

        super().__init__(f"FHN_PDE_{d_x}", mn, mx, u0, **kwargs)

    def _lap_stencil(self, g):
        """Periodic 5-point Laplacian of g with shape (d_y, d_x)."""
        gxx = (jnp.roll(g, -1, axis=-1) - 2.0 * g + jnp.roll(g, 1, axis=-1)) / self._hx2
        gyy = (jnp.roll(g, -1, axis=-2) - 2.0 * g + jnp.roll(g, 1, axis=-2)) / self._hy2
        return gxx + gyy

    def dense_laplacian(self):
        """Reference-style dense Kronecker operator (test oracle)."""
        h_x = 2.0 / (self.d_x - 1)
        h_y = 2.0 / (self.d_y - 1)
        Dxx = _periodic_second_diff(self.d_x, h_x)
        Dyy = _periodic_second_diff(self.d_y, h_y)
        return np.kron(np.eye(self.d_y), Dxx) + np.kron(Dyy, np.eye(self.d_x))

    def _f(self, t, u):
        d = self.d_x * self.d_y
        u1 = u[:d].reshape(self.d_y, self.d_x)
        u2 = u[d:].reshape(self.d_y, self.d_x)
        a, b, k, tau = 2.8e-4, 5e-3, -5e-3, 0.1
        U = a * self._lap_stencil(u1) + u1 - u1 ** 3 - u2 + k
        V = (1.0 / tau) * (b * self._lap_stencil(u2) + u1 - u2)
        return jnp.concatenate([U.reshape(-1), V.reshape(-1)])


class Burgers(ODE):
    """Viscous Burgers 1D, periodic BC, nu=1/100, d=d_x
    (reference systems.py:402-459). u0 = 0.5(cos(4.5 pi x) + 1).

    TPU-native: the reference's tridiagonal-with-corners Dxx/Dx matvecs
    (systems.py:421-442) become 3-point periodic stencils via jnp.roll —
    VPU shifts instead of emulated f64 matmuls. ``dense_operators()``
    returns the reference matrices as a test oracle."""

    def __init__(self, d_x, nu=1.0 / 100.0, **kwargs):
        self.d_x = int(d_x)
        self.nu = float(nu)
        d = self.d_x
        self.d = d
        h = 2.0 / (d - 1)
        self._h = h
        self._inv_h2 = nu / (h * h)
        self._inv_2h = 1.0 / (2.0 * h)

        mn, mx = np.array([[0.0] * d, [1.0] * d])
        x = np.linspace(-1.0, 1.0, num=d)
        u0 = 0.5 * (np.cos(4.5 * np.pi * x) + 1.0)
        super().__init__(f"Burgers_{d_x}", mn, mx, u0, **kwargs)

    def dense_operators(self):
        """Reference-style (Dxx, Dx) dense matrices (test oracle)."""
        h = self._h
        return (
            self.nu * _periodic_second_diff(self.d_x, h),
            _periodic_first_diff(self.d_x, h),
        )

    def _f(self, t, u):
        up = jnp.roll(u, -1)  # u[i+1], periodic
        um = jnp.roll(u, 1)   # u[i-1], periodic
        u_xx = (up - 2.0 * u + um) * self._inv_h2
        u_x = (up - um) * self._inv_2h
        return u_xx - u * u_x

    def _f_norm11(self, t, v):
        """[-1,1]-normalized field fused algebraically (bounds [0,1]^d):
        u=(v+1)/2 and scale=2 give f_n(v) = Dxx v - (v+1)(Dx v)/2, saving
        the affine unwrap/rescale ops in the RK hot loop."""
        vp = jnp.roll(v, -1)
        vm = jnp.roll(v, 1)
        v_xx = (vp - 2.0 * v + vm) * self._inv_h2
        v_x = (vp - vm) * (0.5 * self._inv_2h)
        return v_xx - (v + 1.0) * v_x

    def get_ds_vector_field(self):
        """Double-single (f32x2) twin of the normalized field for the
        compensated-arithmetic fine solver (ops/rk_ds.py)."""
        if self.normalizer.norm_type != "-11":
            raise NotImplementedError(
                "ds field implemented for the [-1,1]-normalized form"
            )
        from nngparareal_tpu.ops.rk_ds import make_burgers_ds_field

        return make_burgers_ds_field(self)


class DiffReact(ODE):
    """2D diffusion-reaction two-species system with Neumann-like BC,
    adapted by the reference from PDEBench (reference systems.py:463-577).
    The Laplacian is assembled sparse on the host and densified for the
    TPU matvec path."""

    def __init__(self, d_x, Du=1e-3, Dv=5e-3, k=5e-3, seed=45, **kwargs):
        import scipy.sparse as sp

        self.d_x = int(d_x)
        self.d_y = int(d_x)
        self.Du, self.Dv, self.k = float(Du), float(Dv), float(k)
        d = 2 * self.d_x * self.d_y
        self.d = d

        Nx, Ny = self.d_x, self.d_y
        hx = 2.0 / Nx
        hy = 2.0 / Ny

        main = -2.0 * np.ones(Nx) / hx ** 2 - 2.0 * np.ones(Nx) / hy ** 2
        main[0] = -1.0 / hx ** 2 - 2.0 / hy ** 2
        main[-1] = -1.0 / hx ** 2 - 2.0 / hy ** 2
        main = np.tile(main, Ny)
        main[:Nx] = -2.0 / hx ** 2 - 1.0 / hy ** 2
        main[Nx * (Ny - 1):] = -2.0 / hx ** 2 - 1.0 / hy ** 2
        main[0] = -1.0 / hx ** 2 - 1.0 / hy ** 2
        main[Nx - 1] = -1.0 / hx ** 2 - 1.0 / hy ** 2
        main[Nx * (Ny - 1)] = -1.0 / hx ** 2 - 1.0 / hy ** 2
        main[-1] = -1.0 / hx ** 2 - 1.0 / hy ** 2

        left = np.ones(Nx)
        left[0] = 0.0
        left = np.tile(left, Ny)[1:] / hx ** 2
        right = np.ones(Nx)
        right[-1] = 0.0
        right = np.tile(right, Ny)[:-1] / hx ** 2
        bottom = np.ones(Nx * (Ny - 1)) / hy ** 2
        top = np.ones(Nx * (Ny - 1)) / hy ** 2

        lap = sp.diags(
            [main, left, right, bottom, top], [0, -1, 1, -Nx, Nx]
        ).toarray()
        self._lap = jnp.asarray(lap)

        mn, mx = np.array([[-4.0] * d, [4.0] * d])
        rng = np.random.default_rng(seed)
        u0 = rng.uniform(size=d)
        super().__init__(f"DiffReact2D_{d_x}", mn, mx, u0, **kwargs)

    def _f(self, t, y):
        lap = self._lap
        d = lap.shape[0]
        u, v = y[:d], y[d:]
        react_u = u - u ** 3 - self.k - v
        react_v = u - v
        u_t = react_u + self.Du * (lap @ u)
        v_t = react_v + self.Dv * (lap @ v)
        return jnp.concatenate([u_t, v_t])
