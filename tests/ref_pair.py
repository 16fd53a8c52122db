"""Brute-force O(N^2) float64 reference for the SPH-BVF pair physics.

A direct, slow transcription of the i-side formulas of
pair_ssa_tsdpd_bvf_{transport_velocity,mechanics,fsi}.cpp — used as the
executable spec that the vectorized cell-list implementation must match.
Mirrors (j-side) updates are omitted because every mirror term equals the
i-side term of the reversed pair (full-list equivalence; see ops/pair.py).
"""

import numpy as np

CONST_WFD = {1: -15.0, 2: -19.098593171027440292, 3: -25.066903536973515383}
CONST_WF = {2: 1.591549430918954, 3: 2.088908628081126}


def lucy_w(r, h, dim):
    if r >= h:
        return 0.0
    if dim == 1:
        q = 1.0 - r / h
        return (5.0 / 4.0) / h * q**3 * (1.0 + 3.0 * r / h)
    return CONST_WF[dim] * (h - r) ** 3 * (h + 3.0 * r) / h ** (dim + 4)


def lucy_wfd(r, h, dim):
    if r >= h:
        return 0.0
    # 2D: -19.0986 (h-r)^2 / h^6; 3D: -25.0669 (h-r)^2 / h^7 (reference :209,:222)
    return CONST_WFD[dim] * (h - r) ** 2 / h ** (dim + 4)


def compute_reference(
    x, v, vest, rho, rhoI, C, S, ptype, solid, fixed,
    mass, B, rho0, c0, G0, cut, cutc, visc, kappa,
    dim=2, variant="transport_velocity",
):
    """Returns dict of accumulators [N, ...] (f is [N,3], etc.)."""
    n = x.shape[0]
    ns = C.shape[1]
    tv = variant == "transport_velocity"
    mech = variant == "mechanics"
    fsi = variant == "fsi"

    P = 7.0 * B[ptype] * (rho / rho0[ptype] - 1.0)
    m = mass[ptype]
    V2 = (m / rho) ** 2
    G0p = G0[ptype].astype(float).copy()
    if fsi and ns > 0:
        G0p = G0p * (1.0 - 0.99 * C[:, 0])

    # per-particle artificial stress
    AS = np.zeros((n, 3, 3))
    coef = 0.1 if fsi else 0.35
    for i in range(n):
        if solid[i]:
            pval = abs(P[i]) if mech else P[i]
            total = S[i] - pval * np.eye(3)
            AS[i] = np.where(total > 0.0, -coef * total / rho[i] ** 2, 0.0)

    out = dict(
        num_den=np.zeros(n), rhoAux1=np.zeros(n), rhoAux2=np.zeros(n),
        ddv=np.zeros((n, 3)), ddx=np.zeros((n, 3)), f=np.zeros((n, 3)),
        vir=np.zeros(n),
        drho=np.zeros(n), de=np.zeros(n), phi=np.zeros(n),
        nw=np.zeros((n, 3)), Q=np.zeros((n, ns)), dS=np.zeros((n, 3, 3)),
        vws=np.zeros((n, 3)), aws=np.zeros((n, 3)),
    )
    ampl_damp = 0.1 if fsi else 0.0
    wdelta_ratio = 2.6 if tv else 3.0

    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            dx = x[i] - x[j]
            rsq = float(dx @ dx)
            h = cut[ptype[i], ptype[j]]
            if rsq >= h * h:
                continue
            r = np.sqrt(rsq)
            wfd = lucy_wfd(r, h, dim)
            wf = lucy_w(r, h, dim)
            wdelta = lucy_w(h / wdelta_ratio, h, dim)

            mi, mj = m[i], m[j]
            Vi2, Vj2 = V2[i], V2[j]

            # sweep 1
            out["num_den"][i] += Vj2 * wf
            out["rhoAux1"][i] += rhoI[j] * wf
            out["rhoAux2"][i] += wf
            out["ddv"][i] += 70.0 * B[ptype[i]] * (Vi2 + Vj2) * wfd * dx
            if not tv:
                out["ddx"][i] += Vj2 * (vest[j] - vest[i]) * wf

            # sweep 2
            fi = P[i]
            fj = P[j]
            velvec = vest[i] - vest[j]
            delVdotDelR = float(dx @ velvec)

            tt = 0.5 * (
                np.outer(rho[i] * vest[i], v[i] - vest[i])
                + np.outer(rho[j] * vest[j], v[j] - vest[j])
            )
            ftrans = (Vi2 + Vj2) * (tt @ dx) * wfd

            fvisc = (Vi2 + Vj2) * visc[ptype[i], ptype[j]] * wfd

            fit = fi / rho[i] ** 2
            fjt = fj / rho[j] ** 2
            pij = fit + fjt
            if tv:
                if pij >= 0.0 or (solid[i] and solid[j]):
                    fpair = mi * mj * (fjt + fit) * wfd
                else:
                    fpair = mi * mj * (fjt - fit) * wfd
            else:
                fpair = mi * mj * pij * wfd

            xdotAS = mi * mj * wfd * (wf / wdelta) ** 4 * (dx @ (AS[i] + AS[j]))

            if not solid[i]:
                f_pair = -dx * fpair + fvisc * velvec + ftrans + xdotAS
                out["f"][i] += f_pair
                # pairwise virial r_ij . f_ij (Pair::ev_tally v_tally analog)
                out["vir"][i] += dx @ f_pair
            else:
                xdotDev = (
                    mi * mj * wfd
                    * (dx @ (S[i] / rho[i] ** 2 + S[j] / rho[j] ** 2))
                )
                if delVdotDelR < 0.0:
                    mu = h * delVdotDelR / (rsq + 0.01 * h * h)
                    fviscs = (
                        mi * mj * wfd
                        * (-(c0[ptype[i]] + c0[ptype[j]]) * mu + 2.0 * mu * mu)
                        / (rho[i] + rho[j])
                    )
                else:
                    fviscs = 0.0
                f_pair = -dx * fpair - dx * fviscs + xdotDev + xdotAS
                out["f"][i] += f_pair
                out["vir"][i] += dx @ f_pair

            # Jaumann rate for solid i
            if solid[i]:
                dvest = vest[j] - vest[i]
                strain = 0.5 * (mj / rho[j]) * wfd * (
                    np.outer(dvest, dx) + np.outer(dx, dvest)
                )
                rot = 0.5 * (mj / rho[j]) * wfd * (
                    np.outer(dvest, dx) - np.outer(dx, dvest)
                )
                geff = 2.0 * G0p[i] * G0p[j] / (G0p[i] + G0p[j] + 1e-12)
                for a in range(3):
                    for b in range(3):
                        ddr = S[i][a] @ rot[b]
                        rds = rot[a] @ S[i][:, b]
                        out["dS"][i][a, b] += (
                            2.0 * geff
                            * (strain[a, b] - (1.0 / 3.0) * (a == b) * strain[a, b])
                            + ddr + rds
                        )

            # density: new formulation
            dvt = v[i] - v[j]
            delVt = float(dx @ dvt)
            corr_i = rho[i] * float((vest[i] - v[i]) @ dx)
            corr_j = rho[j] * float((vest[j] - v[j]) @ dx)
            d = rho[i] * mj * delVt * wfd / rho[j]
            if ampl_damp:
                d -= (
                    ampl_damp * h * rho[i] * c0[ptype[i]] * mj * 2.0
                    * (rho[j] / rho[i] - 1.0) * (rsq / (rsq + 0.01 * h * h))
                    * wfd / rho[j]
                )
            d -= (mj / rho[j]) * (corr_i + corr_j) * wfd
            out["drho"][i] += d

            out["de"][i] += -0.5 * (
                fpair * delVdotDelR + fvisc * float(velvec @ velvec)
            )

            if not solid[i] and solid[j]:
                out["phi"][i] += Vj2 * wf
                out["nw"][i] += dx * wfd * Vj2

            # species
            hc = cutc[ptype[i], ptype[j]]
            if r < hc:
                wfd_c = lucy_wfd(r, hc, dim)
                dQc = (
                    2.0 * (mi * mj / (mi + mj))
                    * ((rho[i] + rho[j]) / (rho[i] * rho[j]))
                    * rsq * wfd_c / (rsq + 0.01 * hc * hc)
                )
                for k in range(ns):
                    q = kappa[ptype[i], ptype[j], k] * (C[i, k] - C[j, k]) * dQc
                    if tv:
                        q -= (mj / rho[j]) * (
                            C[i, k] * float((vest[i] - v[i]) @ dx)
                            + C[j, k] * float((vest[j] - v[j]) @ dx)
                        ) * wfd_c
                    out["Q"][i, k] += q

    # sweep 3 (needs f)
    for i in range(n):
        if solid[i]:
            continue
        for j in range(n):
            if i == j or not solid[j]:
                continue
            if not tv and fixed[j]:
                continue
            dx = x[i] - x[j]
            rsq = float(dx @ dx)
            h = cut[ptype[i], ptype[j]]
            if rsq >= h * h:
                continue
            wf = lucy_w(np.sqrt(rsq), h, dim)
            out["vws"][i] += vest[j] * wf * V2[j]
            out["aws"][i] += (out["f"][j] / m[j]) * wf * V2[j]
    return out
