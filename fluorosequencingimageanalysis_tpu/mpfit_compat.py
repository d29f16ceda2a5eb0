"""mpfit-compatible Levenberg-Marquardt driver (host-side).

The reference vendors the MINPACK-lineage ``mpfit`` class
(/root/reference/agpy/mpfit/mpfit.py:597, FORTRAN->IDL->Python port) and the
pipeline reaches it through agpy's gaussfit. This module reproduces the
*interface contract* — the ``fcn(p, fjac=None, **functkw) -> [status,
residuals]`` callback, the ``parinfo`` semantics (value / fixed / limited /
limits / tied / parname / step / relstep / mpside; mpmaxstep raises
NotImplementedError — the reference pipeline never sets it), and the result
attributes (params, perror, covar, fnorm, niter, nfev, status, errmsg,
dof) — on top of scipy's bounded trust-region least squares. It is NOT a port of mpfit's internals: the
pipeline's hot path (thousands of 5x5 PSF fits) runs on the batched
lane-major TPU LM in ops/lm.py; this class exists for API parity with
user code that drives mpfit directly.

Status codes follow mpfit.py:754-790: 1 = converged (ftol), 2 = xtol,
5 = maxiter reached, <=0 = error (errmsg set).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares


class mpfit:
    blas_enorm32 = None  # mpfit module-level artifacts some callers poke
    blas_enorm64 = None

    def __init__(self, fcn, xall=None, functkw={}, parinfo=None,
                 ftol=1.e-10, xtol=1.e-10, gtol=1.e-10, damp=0.,
                 maxiter=200, factor=100., nprint=1, iterfunct="default",
                 iterkw={}, nocovar=0, rescale=0, autoderivative=1,
                 quiet=0, diag=None, epsfcn=None, debug=0):
        self.niter = 0
        self.nfev = 0
        self.status = 0
        self.errmsg = ""
        self.params = None
        self.perror = None
        self.covar = None
        self.fnorm = None
        self.dof = 0

        # -- parinfo unpacking (mpfit.py:895-982 semantics) ----------------
        if xall is None:
            if parinfo is None:
                self.errmsg = "ERROR: must pass parameters in P or PARINFO"
                return
            xall = np.array([float(p.get("value", 0.0)) for p in parinfo])
        xall = np.asarray(xall, dtype=float).copy()
        npar = len(xall)
        if parinfo is not None and len(parinfo) != npar:
            self.errmsg = "ERROR: number of parameters must match parinfo"
            return

        def pinfo(key, default):
            if parinfo is None:
                return [default] * npar
            return [p.get(key, default) for p in parinfo]

        fixed = [bool(f) for f in pinfo("fixed", 0)]
        limited = pinfo("limited", [0, 0])
        limits = pinfo("limits", [0.0, 0.0])
        ptied = [str(t) if t else "" for t in pinfo("tied", "")]
        self.parnames = pinfo("parname", "")
        qanytied = any(t.strip() for t in ptied)
        # Finite-difference controls (mpfit.py:935-965): 'step' is an
        # ABSOLUTE step, 'relstep' a relative one, 'mpside' the sidedness
        # (0/1 -> forward, -1 -> backward, 2 -> central).
        steps = [float(s) for s in pinfo("step", 0.0)]
        relsteps = [float(s) for s in pinfo("relstep", 0.0)]
        mpsides = [int(s) for s in pinfo("mpside", 0)]
        # 'mpmaxstep' (max parameter change per iteration, mpfit.py:966-982)
        # constrains the optimizer's trust region per-parameter, which the
        # scipy TRF backend cannot express. The reference pipeline never
        # sets it (gaussfitter builds parinfo without it); refuse loudly
        # rather than silently ignore.
        if any(float(s) != 0.0 for s in pinfo("mpmaxstep", 0.0)):
            raise NotImplementedError(
                "parinfo['mpmaxstep'] is not supported by the scipy-backed "
                "mpfit compatibility driver (the reference pipeline never "
                "uses it; drive the batched ops.lm fitter for bounded "
                "per-step control).")

        free_idx = [i for i in range(npar)
                    if not fixed[i] and not ptied[i].strip()]
        nfree = len(free_idx)
        if nfree == 0:
            self.errmsg = "ERROR: no free parameters"
            return

        # Out-of-bound starts are an error in mpfit (mpfit.py:1003-1008).
        for i in free_idx:
            if (limited[i][0] and xall[i] < limits[i][0]) or \
                    (limited[i][1] and xall[i] > limits[i][1]):
                self.errmsg = "ERROR: parameter %d is not within PARINFO " \
                              "limits" % i
                return

        lo = np.array([limits[i][0] if limited[i][0] else -np.inf
                       for i in free_idx])
        hi = np.array([limits[i][1] if limited[i][1] else np.inf
                       for i in free_idx])

        def tie(p):
            # mpfit evaluates tied expressions in terms of the full p
            # vector (mpfit.py:1446-1458).
            if qanytied:
                for i, expr in enumerate(ptied):
                    if expr.strip():
                        p[i] = eval(expr, {"__builtins__": {}},
                                    {"p": p, "numpy": np, "np": np})
            return p

        abort = {"flag": False, "status": 0}

        def residuals(xfree):
            p = xall.copy()
            p[free_idx] = xfree
            p = tie(p)
            self.nfev += 1
            status, fvec = fcn(p, fjac=None, **functkw)
            if status < 0:
                abort["flag"] = True
                abort["status"] = status
                return np.zeros(1)
            fvec = np.asarray(fvec, dtype=float)
            if damp > 0:
                # mpfit's damping: residuals squashed through tanh
                # (mpfit.py:625-632).
                fvec = np.tanh(fvec / damp) * damp
            return fvec

        # Custom finite-difference Jacobian honoring per-parameter
        # step/relstep/mpside (fdjac2 semantics, mpfit.py:1512-1612:
        # explicit steps win over the machine-epsilon default, and the
        # step flips sign away from a violated upper bound).
        use_custom_fd = any(steps[i] or relsteps[i] or mpsides[i] == 2 or
                            mpsides[i] == -1 for i in free_idx)
        machep_sqrt = np.sqrt(np.finfo(float).eps)

        def fd_jacobian(xfree):
            f0 = residuals(xfree)
            m = f0.size
            jac = np.zeros((m, nfree))
            for a, i in enumerate(free_idx):
                h = machep_sqrt * abs(xfree[a])
                if steps[i]:
                    h = steps[i]
                if relsteps[i]:
                    h = relsteps[i] * abs(xfree[a])
                if h == 0.0:
                    h = machep_sqrt
                side = mpsides[i]
                if side != 2:
                    if side == -1:
                        h = -h
                    # Bound-aware sign flip (mpfit.py:1566-1570).
                    if limited[i][1] and xfree[a] + h > limits[i][1]:
                        h = -h
                    xp = xfree.copy()
                    xp[a] = xfree[a] + h
                    jac[:, a] = (residuals(xp) - f0) / h
                else:
                    xp, xm = xfree.copy(), xfree.copy()
                    xp[a] = xfree[a] + h
                    xm[a] = xfree[a] - h
                    jac[:, a] = (residuals(xp) - residuals(xm)) / (2 * h)
            return jac

        x0 = np.clip(xall[free_idx], lo, hi)
        try:
            sol = least_squares(residuals, x0, bounds=(lo, hi),
                                method="trf", ftol=ftol, xtol=xtol,
                                gtol=gtol,
                                jac=fd_jacobian if use_custom_fd
                                else "2-point",
                                max_nfev=maxiter * (nfree + 1))
        except Exception as e:  # pragma: no cover - defensive
            self.errmsg = "ERROR: " + str(e)
            self.status = 0
            return
        if abort["flag"]:
            self.status = abort["status"]
            self.errmsg = "ERROR: user function signaled abort"
            return

        p = xall.copy()
        p[free_idx] = sol.x
        self.params = tie(p)
        m = sol.fun.size
        self.dof = max(m - nfree, 0)
        self.fnorm = float(np.sum(sol.fun ** 2))
        self.niter = getattr(sol, "nfev", self.nfev)
        if sol.status == 0:
            self.status = 5  # maxiter / max_nfev reached (mpfit status 5)
        elif sol.status in (2, 3):
            self.status = 1  # ftol-style convergence
        elif sol.status == 1:
            self.status = 4  # gtol convergence (mpfit status 4)
        else:
            self.status = 2  # xtol convergence

        if not nocovar:
            try:
                jtj = sol.jac.T @ sol.jac
                cv = np.linalg.pinv(jtj)
                self.covar = np.zeros((npar, npar))
                for a, ia in enumerate(free_idx):
                    for b, ib in enumerate(free_idx):
                        self.covar[ia, ib] = cv[a, b]
                self.perror = np.zeros(npar)
                d = np.diagonal(self.covar)
                wh = np.nonzero(d >= 0)[0]
                self.perror[wh] = np.sqrt(np.maximum(d[wh], 0.0))
            except Exception:  # pragma: no cover - degenerate jacobian
                self.covar = None
                self.perror = None

    def __str__(self):
        return ("mpfit(status=%s, params=%s)" %
                (self.status, self.params))

    def enorm(self, vec):
        """Euclidean norm (mpfit.py enorm helper)."""
        return float(np.sqrt(np.sum(np.asarray(vec, dtype=float) ** 2)))
