"""mpfit-compatible Levenberg-Marquardt driver (host-side).

The reference vendors the MINPACK-lineage ``mpfit`` class
(/root/reference/agpy/mpfit/mpfit.py:597, FORTRAN->IDL->Python port) and the
pipeline reaches it through agpy's gaussfit. This module reproduces the
*interface contract* — the ``fcn(p, fjac=None, **functkw) -> [status,
residuals]`` callback, the ``parinfo`` semantics (value / fixed / limited /
limits / tied / parname), and the result attributes (params, perror, covar,
fnorm, niter, nfev, status, errmsg, dof) — on top of scipy's bounded
trust-region least squares. It is NOT a port of mpfit's internals: the
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

        x0 = np.clip(xall[free_idx], lo, hi)
        try:
            sol = least_squares(residuals, x0, bounds=(lo, hi),
                                method="trf", ftol=ftol, xtol=xtol,
                                gtol=gtol,
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
