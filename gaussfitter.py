"""Compatibility shim: the agpy ``gaussfitter`` surface the pipeline uses
(/root/reference/agpy/gaussfitter.py), backed by the batched TPU LM.

The default elliptical+rotated+vheight case (the pipeline's only use,
pflib.py:199-214) runs on the lane-major batched LM; reduced modes
(circle / no-rotate / no-vheight) fall back to scipy bounded least squares
with the exact agpy parameter conventions.
"""

import numpy as np
from numpy.ma import median
from scipy.optimize import least_squares


def moments(data, circle, rotate, vheight, estimator=median, **kwargs):
    """Moment-based initial parameters (gaussfitter.py:29-61)."""
    data = np.asarray(data)
    total = np.abs(data).sum()
    Y, X = np.indices(data.shape)
    y = np.argmax((X * np.abs(data)).sum(axis=1) / total)
    x = np.argmax((Y * np.abs(data)).sum(axis=0) / total)
    col = data[int(y), :]
    width_x = np.sqrt(np.abs((np.arange(col.size) - y) * col).sum() /
                      np.abs(col).sum())
    row = data[:, int(x)]
    width_y = np.sqrt(np.abs((np.arange(row.size) - x) * row).sum() /
                      np.abs(row).sum())
    width = (width_x + width_y) / 2.0
    height = estimator(data.ravel())
    amplitude = data.max() - height
    mylist = [amplitude, x, y]
    if np.isnan(width_y) or np.isnan(width_x) or np.isnan(height) or \
            np.isnan(amplitude):
        raise ValueError("something is nan")
    if vheight == 1:
        mylist = [height] + mylist
    if circle == 0:
        mylist = mylist + [width_x, width_y]
        if rotate == 1:
            mylist = mylist + [0.0]
    else:
        mylist = mylist + [width]
    return mylist


def twodgaussian(inpars, circle=False, rotate=True, vheight=True, shape=None):
    """The agpy 2D Gaussian closure (gaussfitter.py:63-140), with its exact
    parameter-popping convention (center_y then center_x)."""
    inpars_old = inpars
    inpars = list(inpars)
    if vheight == 1:
        height = float(inpars.pop(0))
    else:
        height = 0.0
    amplitude, center_y, center_x = (float(inpars.pop(0)),
                                     float(inpars.pop(0)),
                                     float(inpars.pop(0)))
    if circle == 1:
        width = float(inpars.pop(0))
        width_x = width_y = width
        rotate = 0
    else:
        width_x = float(inpars.pop(0))
        width_y = float(inpars.pop(0))
    if rotate == 1:
        rota = np.pi / 180.0 * float(inpars.pop(0))
        rcen_x = center_x * np.cos(rota) - center_y * np.sin(rota)
        rcen_y = center_x * np.sin(rota) + center_y * np.cos(rota)
    else:
        rota = 0.0
        rcen_x = center_x
        rcen_y = center_y
    if len(inpars) > 0:
        raise ValueError("There are still input parameters:" + str(inpars) +
                         " and you've input: " + str(inpars_old) +
                         " circle=%d, rotate=%d, vheight=%d" %
                         (circle, rotate, vheight))

    def rotgauss(x, y):
        if rotate == 1:
            xp = x * np.cos(rota) - y * np.sin(rota)
            yp = x * np.sin(rota) + y * np.cos(rota)
        else:
            xp = x
            yp = y
        return height + amplitude * np.exp(
            -(((rcen_x - xp) / width_x) ** 2 +
              ((rcen_y - yp) / width_y) ** 2) / 2.0)

    if shape is not None:
        return rotgauss(*np.indices(shape))
    return rotgauss


def gaussfit(data, err=None, params=(), autoderiv=True, return_all=False,
             circle=False,
             fixed=np.repeat(False, 7),
             limitedmin=[False, False, False, False, True, True, True],
             limitedmax=[False, False, False, False, False, False, True],
             usemoment=np.array([], dtype="bool"),
             minpars=np.repeat(0, 7), maxpars=[0, 0, 0, 0, 0, 0, 360],
             rotate=1, vheight=1, quiet=True, returnmp=False,
             returnfitimage=False, **kwargs):
    """Bounded 2D Gaussian fit (gaussfitter.py:142-255)."""
    data = np.asarray(data, dtype=np.float64)
    usemoment = np.array(usemoment, dtype="bool")
    params = np.array(params, dtype="float")
    fixed = np.array(fixed)
    if usemoment.any() and len(params) == len(usemoment):
        moment = np.array(moments(data, circle, rotate, vheight, **kwargs),
                          dtype="float")
        params[usemoment] = moment[usemoment]
    elif params.size == 0:
        params = np.array(moments(data, circle, rotate, vheight, **kwargs),
                          dtype="float")
    if vheight == 0:
        vheight = 1
        params = np.concatenate([[0], params])
        fixed = np.concatenate([[1], np.asarray(fixed)[:len(params) - 1]])
    # Clip out-of-range starts (gaussfitter.py:201-204).
    n_par = len(params)
    for i in range(n_par):
        if limitedmax[i] and params[i] > maxpars[i]:
            params[i] = maxpars[i]
        if limitedmin[i] and params[i] < minpars[i]:
            params[i] = minpars[i]

    full = (circle == 0 and rotate == 1 and vheight == 1 and n_par == 7 and
            not np.any(np.asarray(fixed)[:7]) and data.shape == (5, 5) and
            err is None)
    if full:
        from fluorosequencingimageanalysis_tpu.ops.lm import \
            fit_gaussians_batched
        lo = np.array([minpars[i] if limitedmin[i] else -1e30
                       for i in range(7)], dtype=np.float64)
        hi = np.array([maxpars[i] if limitedmax[i] else 1e30
                       for i in range(7)], dtype=np.float64)
        p_fit, _ = fit_gaussians_batched(data[None], p0=params[None],
                                         lo=lo[None], hi=hi[None],
                                         num_iters=120)
        p_fit = np.asarray(p_fit[0])
    else:
        # Reduced modes / errors / non-5x5 data: exact scipy fallback.
        lo = np.array([minpars[i] if limitedmin[i] else -np.inf
                       for i in range(n_par)], dtype=np.float64)
        hi = np.array([maxpars[i] if limitedmax[i] else np.inf
                       for i in range(n_par)], dtype=np.float64)
        for i in range(n_par):
            if i < len(fixed) and fixed[i]:
                lo[i] = params[i] - 1e-12
                hi[i] = params[i] + 1e-12

        def resid(p):
            model = twodgaussian(p, circle, rotate, vheight)(
                *np.indices(data.shape))
            r = (model - data)
            if err is not None:
                r = r / err
            return r.ravel()

        sol = least_squares(resid, np.clip(params, lo, hi), bounds=(lo, hi),
                            method="trf", xtol=1e-12, ftol=1e-12,
                            max_nfev=2000)
        p_fit = sol.x

    if returnmp:
        class _MP:  # minimal mpfit-result stand-in
            pass
        mp = _MP()
        mp.params = p_fit
        mp.perror = None
        returns = mp
    elif return_all == 0:
        returns = p_fit
    elif return_all == 1:
        returns = (p_fit, None)
    if returnfitimage:
        fitimage = twodgaussian(p_fit, circle, rotate, vheight)(
            *np.indices(data.shape))
        returns = (returns, fitimage)
    return returns
