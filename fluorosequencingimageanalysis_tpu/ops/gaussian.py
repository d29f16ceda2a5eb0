"""The 2D elliptical Gaussian PSF model, in the reference's exact convention.

The reference pipeline fits 5x5 patches with agpy's ``twodgaussian`` model
(/root/reference/agpy/gaussfitter.py:63-140, invoked with circle=0, rotate=1,
vheight=1 by gaussfit at /root/reference/agpy/gaussfitter.py:207-254) using
a 7-vector of parameters

    p = (H, A, p2, p3, sigma_h, sigma_w, theta_degrees)

evaluated on the (row, col) index grids of the patch. The reference has a
well-known axis quirk that we reproduce *exactly* for numerical parity,
because the fitted subpixel centers feed tracking downstream:

- ``twodgaussian`` pops parameters as (height, amplitude, center_y, center_x)
  so center_y := p2 and center_x := p3
  (/root/reference/agpy/gaussfitter.py:96-103),
- the model is evaluated via ``rotgauss(*numpy.indices(shape))`` so its first
  grid argument is the ROW (h) grid and the second is the COLUMN (w) grid
  (/root/reference/agpy/gaussfitter.py:126-140, 207-219),
- hence, at theta=0, p3 is the row-center and p2 is the column-center, while
  pflib interprets p2 as "h_0" and p3 as "w_0"
  (/root/reference/pflib.py:199-214, 456-461).

With the default symmetric bounds (both centers limited to [2, 3], both
sigmas to [0.75, 2]) the fit itself is insensitive to the swap; only the
interpretation is transposed, consistently, throughout the pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

PSF_PARAM_NAMES = ("H", "A", "h_0", "w_0", "sigma_h", "sigma_w", "theta")

_DEG2RAD = jnp.pi / 180.0


def gauss2d_ref(params, h_grid, w_grid):
    """Evaluate the reference-convention 2D Gaussian.

    Arguments:
        params: (..., 7) parameter vector(s) ``(H, A, p2, p3, sh, sw, theta)``.
        h_grid, w_grid: row-index and column-index grids (any matching shape).

    Returns:
        Model values with shape ``broadcast(params[:-1], grid)``.

    Parity: /root/reference/agpy/gaussfitter.py:113-136. Rotation is applied
    to both the grid and the center ("rcen"), in degrees.
    """
    H = params[..., 0, None, None]
    A = params[..., 1, None, None]
    c2 = params[..., 2, None, None]   # "center_y" == pflib's h_0 slot
    c3 = params[..., 3, None, None]   # "center_x" == pflib's w_0 slot
    sh = params[..., 4, None, None]
    sw = params[..., 5, None, None]
    rota = params[..., 6, None, None] * _DEG2RAD
    cos_r = jnp.cos(rota)
    sin_r = jnp.sin(rota)
    # Rotated center (gaussfitter.py:116-117): rcen_x from center_x=p3.
    rcen_x = c3 * cos_r - c2 * sin_r
    rcen_y = c3 * sin_r + c2 * cos_r
    # Rotated grid (gaussfitter.py:128-129): x := row grid, y := column grid.
    xp = h_grid * cos_r - w_grid * sin_r
    yp = h_grid * sin_r + w_grid * cos_r
    return H + A * jnp.exp(-(((rcen_x - xp) / sh) ** 2 +
                             ((rcen_y - yp) / sw) ** 2) / 2.0)


def gauss2d_image(params, shape=(5, 5), dtype=jnp.float32):
    """Evaluate the model over an index grid of `shape` (the "fit image")."""
    h_grid, w_grid = jnp.meshgrid(
        jnp.arange(shape[0], dtype=dtype),
        jnp.arange(shape[1], dtype=dtype),
        indexing="ij",
    )
    return gauss2d_ref(params, h_grid, w_grid)
