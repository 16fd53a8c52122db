"""SPH-BVF pair physics: the hot loop.

Re-derivation of the three reference pair styles
(`pair_ssa_tsdpd_bvf_{transport_velocity,mechanics,fsi}.cpp`) as fused,
full-neighbor (newton-off) reductions over the cell-slot layout:

 * The reference walks half neighbor lists and mirrors every term onto j
   (``newton_pair || j < nlocal`` blocks).  Each mirrored term is exactly the
   i-side term of the reversed pair, so a full-neighbor evaluation — every
   particle reducing over all its neighbor candidates — produces identical
   sums with no scatter-adds.  The reference's own FSI style already runs
   full lists (pair_ssa_tsdpd_bvf_fsi.cpp:72-77) with the mirror blocks
   deleted, confirming the equivalence.
 * The reference's sweeps 1 and 2 have no data dependence (sweep-1 outputs
   number_density/rhoAux/ddv/ddx are consumed only by the integrator), so
   they are fused into one pass here.  Sweep 3 reads the forces produced by
   sweep 2 (a_weighted_solid needs f) and stays a second pass.
 * Branchy per-pair physics (fluid/solid x free/fixed) becomes arithmetic
   masking; every pair term is linear in a kernel weight, so masking the
   weights (validity, self-exclusion; the r >= h case is already an exact
   zero of the Lucy kernel) masks everything downstream with no NaN hazards.

Layout: per-particle blocks are [cap, NC] with components leading (see
core/state.py); pair blocks are [ci, cj, NC] with components leading —
[3, ci, cj, NC] vectors, [3, 3, ci, cj, NC] tensors.  The trailing (cj, NC)
pair lands on the TPU's (sublane, lane) tiles; the cj-reductions are cheap
cross-sublane sums; small component axes are unrolled loops over well-tiled
blocks (never lane-padded).  Neighbor access is `shift_cells` (lane rolls ->
ICI collective-permutes under sharding).

Known deliberate deviation: the reference adds the *i-perspective* pair
energy `deltaE` to both i and j (pair...transport_velocity.cpp:558,658) even
when the Sun-2018 pressure switch has flipped fpair's sign for the j side;
the full-neighbor evaluation gives each side its own perspective.  `de` is
accumulated but never integrated by any shipped fix (all ``e[i] += dtf*de``
lines are commented out, e.g. fix_ssa_tsdpd_bvf.cpp:209), so fields are
unaffected.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sph_bvf_tpu.ops import rand
from sph_bvf_tpu.ops.kernels import lucy_w, lucy_w_ih, lucy_wfd, lucy_wfd_ih
from sph_bvf_tpu.ops.eos import tait_pressure
from sph_bvf_tpu.core.state import Geometry, Params, State, shift_cells

TRANSPORT_VELOCITY = "transport_velocity"
MECHANICS = "mechanics"
FSI = "fsi"


@dataclasses.dataclass(frozen=True)
class PairConfig:
    """Static physics-variant switches (resolved at trace time).

    Defaults reproduce `pair_style ssa_tsdpd/bvf/transportVelocity`; the
    factory methods give the mechanics / fsi variants (diffs documented per
    field with reference citations).
    """

    variant: str = TRANSPORT_VELOCITY
    dim: int = 2
    # SDPD thermal-fluctuation random force (pair...transport_velocity.cpp:406-431).
    # Off by default: every shipped example runs e=0, which zeroes it anyway.
    thermal: bool = False
    # Sun-2018 pressure switch (tv: pair...transport_velocity.cpp:396-399;
    # mechanics/fsi use the plain symmetric Zhang force, pair...mechanics.cpp:408).
    pressure_switch: bool = True
    # XSPH accumulator ddx (mechanics/fsi only, pair...mechanics.cpp:249-253).
    xsph: bool = False
    # Artificial-stress amplitude: 0.35 (tv/mechanics) vs 0.1 (fsi)
    # (pair...transport_velocity.cpp:458, pair...fsi.cpp:455).
    art_stress_coef: float = 0.35
    # mechanics subtracts |P| in the total-stress test (pair...mechanics.cpp:471).
    art_stress_abs_p: bool = False
    # wdelta reference distance: h/2.6 (tv, :316) vs h/3 (mechanics/fsi, :333).
    wdelta_ratio: float = 2.6
    # density-diffusion damping amplitude: 0 (tv/mechanics) vs 0.1 (fsi, :535).
    # The reference gates it on tnow <= tdamp with tdamp = the whole run, so
    # it is a constant during a run.
    ampl_damp: float = 0.0
    # chemo-mechanical softening G0_eff = G0 (1 - 0.99 C[0]) (fsi, :441-445).
    g0_chem_coupling: bool = False
    # species advection-correction flux term (tv only, :714-715).
    species_advection: bool = True
    # store per-particle pressure into Pnew (mechanics/fsi, :188).
    store_pnew: bool = False
    # sweep-3 weighted-solid sums skip fixed solids (mechanics/fsi, :893-909).
    weighted_solid_skip_fixed: bool = False
    # compute sweep 3 at all (only the plain-bvf integrator consumes vws/aws;
    # the scene builder enables this when that integrator is selected).
    weighted_solid: bool = True
    # use the Pallas pass-A kernel when eligible (ops/pair_pallas.py)
    use_pallas: bool = True
    # static model hints (skip dead code paths entirely)
    solids_present: bool = True
    elastic_present: bool = True
    # any solid particle is FREE (not fixed_tag)?  Fixed solids never
    # integrate their force (fix...transport_velocity.cpp:200-227), so for
    # wall-only models (lid cavity, natural convection) the whole
    # solid-branch force expression is dead: fluid i gets f_fluid, solid i
    # forces are discarded.  phi/nw/AS j-contributions are kept either way.
    free_solids_present: bool = True
    rng_seed: int = 0
    # truncation order of the per-pair hop-count Poisson (core/ssa.py)
    ssa_poisson_terms: int = 6
    # SSA configs on TPU: True runs the mechanics through the Pallas
    # kernel plus a separate jnp Qd hop pass (`_pass_a_qd`); False keeps
    # the whole pair pass on the fused jnp path.  Measured on the real
    # chip (tools/ssa_split_bench.py, nx=100, 2026-08-20): split 4.65M
    # ps/s vs whole-jnp 8.0M — the counter-RNG hop draws dominate SSA
    # configs, so the standalone Qd pass costs as much as the whole fused
    # pass and the kernel mechanics is pure overhead on top.  Default
    # False (the winner); the split stays available and bit-identical
    # (test_ssa_split_matches_jnp_path) for SSA-light configs.
    ssa_kernel_split: bool = False
    # round-5 structural experiment on the 64% pass-A skeleton (VALIDATION
    # "Pass-A roofline-gap decomposition"): pre-shift the packed field
    # matrix in HBM — XLA materializes the 9 stencil-shifted views once per
    # call, and the grouped 2D kernel reads 9 lane-ALIGNED block refs
    # instead of rotating a [H|BLK|H] VMEM window per offset.  Trades the
    # in-kernel vector-unit rotation work for HBM traffic, which the
    # round-4 decomposition showed the BlockSpec pipeline overlaps.
    # Grouped 2D shapes only (rowloop/3D keep the window design).
    preshift_window: bool = False
    # accumulate the Shepard-filter inputs rhoAux1/rhoAux2 this step?
    # They are read only on density-filter steps (freq_filter cadence),
    # so run_chunk's phase segmentation flips this off for the steps in
    # between, and Scene.build sets it False permanently for integrators
    # that never filter (IntegratorConfig.reads_rhoaux).  Exact: the
    # accumulators are rebuilt from scratch every step and nothing else
    # reads them.  Measured 7.2% of the flagship pass-A kernel (round 5).
    density_filter_accs: bool = True
    # coefficient tables (coeff_tables) whose [T, T] entries are all equal —
    # computed by Scene.build from the concrete pair_coeff values.  The pair
    # drivers collapse these to a scalar broadcast instead of a per-pair
    # type-select chain (the Pallas kernels) or gather (the jnp path): for
    # the shipped scenes most tables are uniform (one h/eta for every type
    # pair), so this removes ~5 pair-shaped select ops per table per stencil
    # offset from the hot kernel.  Scalarization is bit-exact (table[0, 0]
    # equals every gathered entry).
    uniform_tables: tuple = ()

    @staticmethod
    def transport_velocity(dim=2, **kw):
        return PairConfig(variant=TRANSPORT_VELOCITY, dim=dim, **kw)

    @staticmethod
    def mechanics(dim=2, **kw):
        return PairConfig(
            variant=MECHANICS,
            dim=dim,
            pressure_switch=False,
            xsph=True,
            art_stress_abs_p=True,
            wdelta_ratio=3.0,
            species_advection=False,
            store_pnew=True,
            weighted_solid_skip_fixed=True,
            **kw,
        )

    @staticmethod
    def fsi(dim=2, **kw):
        return PairConfig(
            variant=FSI,
            dim=dim,
            pressure_switch=False,
            xsph=True,
            art_stress_coef=0.1,
            wdelta_ratio=3.0,
            ampl_damp=0.1,
            g0_chem_coupling=True,
            species_advection=False,
            store_pnew=True,
            weighted_solid_skip_fixed=True,
            **kw,
        )


# ---------------------------------------------------------------------------
# per-particle precomputation
# ---------------------------------------------------------------------------


def _per_particle(state: State, params: Params, cfg: PairConfig):
    """Fields every pair term needs, computed once per particle [*, cap, NC]."""
    t = state.ptype
    m = params.mass[t]
    B = params.B[t]
    rho0 = params.rho0[t]
    c0 = params.c0[t]
    G0 = params.G0[t]
    if cfg.g0_chem_coupling and state.C.shape[0] > 0:
        G0 = G0 * (1.0 - 0.99 * state.C[0])
    P = tait_pressure(state.rho, rho0, B)
    inv_rho = 1.0 / state.rho
    m_rho = m * inv_rho
    V2 = m_rho * m_rho
    P_rho2 = P * inv_rho * inv_rho  # pressure force term, hoisted per particle
    solid = state.solid_tag == 1
    fluid = ~solid

    # Monaghan artificial stress tensor (per particle; the reference computes
    # it redundantly inside the pair loop from purely per-particle state,
    # pair...transport_velocity.cpp:453-483).
    p_for_as = jnp.abs(P) if cfg.art_stress_abs_p else P
    inv_rho2 = inv_rho * inv_rho
    if cfg.elastic_present:
        AS = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                total = state.S[a, b] - (p_for_as if a == b else 0.0)
                AS[a][b] = jnp.where(
                    solid & (total > 0.0),
                    -cfg.art_stress_coef * total * inv_rho2,
                    0.0,
                )
        AS = jnp.stack([jnp.stack(row, axis=0) for row in AS], axis=0)
        ASd = None
    else:
        # with S == 0 everywhere the tensor is diagonal: total = -p delta,
        # tensile iff p < 0 — one scalar row replaces the 9-component tensor
        total = -p_for_as
        ASd = jnp.where(
            solid & (total > 0.0), -cfg.art_stress_coef * total * inv_rho2, 0.0
        )
        AS = None

    return dict(
        valid=state.valid,
        x=state.x,
        v=state.v,  # transport velocity (reference atom->v, aliased vt in pair)
        vest=state.vest,  # momentum velocity (reference atom->vest, aliased v)
        rho=state.rho,
        rhoI=state.rhoI,
        e=state.e,
        C=state.C,
        Cd=state.Cd,
        S=state.S,
        tag=state.tag,
        ptype=t,
        solid=solid,
        fluid=fluid,
        fixed=state.fixed_tag == 1,
        m=m,
        B=B,
        c0=c0,
        G0=G0,
        P=P,  # only consumed i-side (Pnew storage); never shifted
        P_rho2=P_rho2,
        inv_rho=inv_rho,
        m_rho=m_rho,
        V2=V2,
        **({"AS": AS} if AS is not None else {"ASd": ASd}),
    )


def _bc(a, side):
    """Broadcast a per-particle field [*, cap, NC] to pair shape.

    side "i": [*, ci, 1, NC];  side "j": [*, 1, cj, NC].
    """
    return a[..., :, None, :] if side == "i" else a[..., None, :, :]


def _dot3(a, b):
    """Dot over the leading component axis: [3, ...] x [3, ...] -> [...]."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _pair_delta(xi, xj, pbc):
    """x_i - x_j with minimum-image correction on periodic axes.

    The stencil wrap brings the right CELLS together, but coordinates stay
    unwrapped, so cross-boundary pairs need the image shift (the analog of
    LAMMPS ghost-atom coordinate shifting, comm_brick.cpp borders).
    ``pbc`` is a static tuple of (axis, extent).
    """
    dx = xi - xj
    if not pbc:
        return dx
    comps = [dx[0], dx[1], dx[2]]
    for ax, ext in pbc:
        comps[ax] = comps[ax] - ext * jnp.round(comps[ax] / ext)
    return jnp.stack(comps, axis=0)


def _xdot_tensor(dx, T):
    """out[m] = sum_k dx[k] T[k, m] — unrolled over the tiny component dims."""
    return jnp.stack(
        [sum(dx[k] * T[k, m] for k in range(3)) for m in range(3)], axis=0
    )


def coeff_tables(params: Params, cfg: PairConfig):
    """[T, T] tables of every per-type-pair quantity the pair pass needs.

    Divisions and kernel normalizations that depend only on the type pair
    are hoisted here (evaluated once, not per pair per step): 1/h, 1/cutc,
    the harmonic mass m_i m_j/(m_i+m_j), the artificial-stress reference
    kernel (1/W(h/ratio))^4, and the harmonic shear modulus.
    """
    safe = lambda x: jnp.where(x > 0, x, 1.0)
    h = params.cut
    out = dict(
        h=h,
        eta=params.visc,
        hc=params.cutc,
        inv_h=1.0 / safe(h),
        inv_hc=1.0 / safe(params.cutc),
        m_harm=params.mass[:, None] * params.mass[None, :]
        / safe(params.mass[:, None] + params.mass[None, :]),
    )
    if cfg.solids_present:
        # keep 1/wdelta (not its 4th power): (wf * inv_wdelta)**4 stays O(1)
        # in f32, whereas wf**4 alone overflows for small h (fsi h ~ 1e-5)
        wdelta = lucy_w(h / cfg.wdelta_ratio, safe(h), cfg.dim)
        out["inv_wdelta"] = 1.0 / safe(wdelta)
    if cfg.elastic_present and not cfg.g0_chem_coupling:
        out["geff"] = (
            2.0 * params.G0[:, None] * params.G0[None, :]
            / (params.G0[:, None] + params.G0[None, :] + 1e-12)
        )
    return out


def used_table_names(params: Params, cfg: PairConfig, ssa: bool = True) -> tuple:
    """The coeff_tables entries `_pass_a_offset` actually reads under this
    config.  The Pallas drivers build select chains only for these (Mosaic
    cannot DCE an unused chain the way XLA drops an unused gather), and the
    jnp driver skips the dead pair-shaped gathers.

    ``ssa=False`` (the Pallas drivers): the Qd hop draws run in the
    separate jnp pass (`_pass_a_qd`), so the species-transport tables are
    staged in-kernel only when the deterministic Q path needs them."""
    names = ["h", "inv_h", "eta"]
    if params.n_sdpd > 0 or (params.n_ssa > 0 and ssa):
        names += ["hc", "inv_hc", "m_harm"]
    if cfg.solids_present:
        names.append("inv_wdelta")
    if cfg.elastic_present and not cfg.g0_chem_coupling:
        names.append("geff")
    return tuple(names)


def lookup_pair_coeffs(ti, tj, params: Params, cfg: PairConfig):
    """Gather the per-type-pair tables for pair-shaped type indices.

    Uniform tables (cfg.uniform_tables) come back as scalars — bit-exact
    with the gather, since every entry equals table[0, 0]."""
    tp = ti * params.ntypes + tj
    tabs = coeff_tables(params, cfg)
    out = {
        k: tabs[k].reshape(-1)[0]
        if k in cfg.uniform_tables
        else tabs[k].reshape(-1)[tp]
        for k in used_table_names(params, cfg)
    }
    if params.n_sdpd > 0:
        out["kap"] = jnp.moveaxis(params.kappa, -1, 0).reshape(
            params.n_sdpd, -1
        )[:, tp]
    if params.n_ssa > 0:
        out["kss"] = jnp.moveaxis(params.kappa_ssa, -1, 0).reshape(
            params.n_ssa, -1
        )[:, tp]
    return out


# ---------------------------------------------------------------------------
# pass A: fused sweeps 1 + 2 (+ species transport)
# ---------------------------------------------------------------------------


def _pass_a_dS(I, J, coeffs, cfg: PairConfig, dx, wfd):
    """Jaumann deviatoric stress-rate pair term (pair...mechanics.cpp:433-451)
    for one stencil offset: [3, 3, ci, cj, NC]; the caller reduces over cj.

    Factored out of `_pass_a_offset` so the rowloop kernel can evaluate it
    under a per-block elastic gate: dS is EXACTLY zero for every i that is
    not a valid solid with G0 > 0 or S != 0 (el carries geff -> 0 when
    G0_i = 0; sdr/rds carry S_i -> 0), so blocks without such particles can
    skip the whole block — by far the largest term group in the elastic
    configs (~24% of fsi pass A, measured round 3).
    """
    solid_i = I["solid"]
    velvec = I["vest"] - J["vest"]
    dvest = -velvec  # vest_j - vest_i
    # strain/rotation: 0.5 (mj/rhoj) wfd (dvest[m] dx[n] +/- dvest[n] dx[m])
    pref = 0.5 * J["m_rho"] * wfd
    if cfg.g0_chem_coupling:
        # fsi softens G0 per particle (pair...fsi.cpp:441-445)
        geff = 2.0 * I["G0"] * J["G0"] / (I["G0"] + J["G0"] + 1e-12)
    else:
        geff = coeffs["geff"]
    two_geff = 2.0 * geff
    # unrolled 3x3: elastic + S.rot^T + rot.S  (S symmetric is not
    # assumed; matches the reference's componentwise updates)
    outer = [[dvest[a] * dx[b] for b in range(3)] for a in range(3)]
    strain = [
        [pref * (outer[a][b] + outer[b][a]) for b in range(3)]
        for a in range(3)
    ]
    rot = [
        [pref * (outer[a][b] - outer[b][a]) for b in range(3)]
        for a in range(3)
    ]
    Si = I["S"]
    rows = []
    for mm in range(3):
        cols = []
        for nn in range(3):
            el = two_geff * strain[mm][nn] * (1.0 if mm != nn else (1.0 - 1.0 / 3.0))
            sdr = sum(Si[mm, k] * rot[nn][k] for k in range(3))
            rds = sum(rot[mm][k] * Si[k, nn] for k in range(3))
            cols.append(
                jnp.where(solid_i, el + sdr + rds, 0.0)
            )
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [3, 3, ci, cj, NC]


def _pass_a_dS_offset(I, J, coeffs, cfg: PairConfig, notself, pbc=()):
    """Standalone dS evaluation for one offset (rowloop elastic-gated pass):
    recomputes the pair geometry exactly as `_pass_a_offset` does, then the
    Jaumann term; returns the cj-reduced [3, 3, ci, NC] accumulator slab."""
    f32 = I["x"].dtype
    dx = _pair_delta(I["x"], J["x"], pbc)
    r = jnp.sqrt(_dot3(dx, dx))
    mask = (I["valid"] & J["valid"] & notself).astype(f32)
    wfd = lucy_wfd_ih(r, coeffs["inv_h"], cfg.dim) * mask
    return jnp.sum(_pass_a_dS(I, J, coeffs, cfg, dx, wfd), axis=-2)


def _pass_a_elastic_f_offset(I, J, coeffs, cfg: PairConfig, notself, pbc=()):
    """Deferred elastic force terms for one offset (rowloop gated pass):
    the artificial-stress force (pair...transport_velocity.cpp:486-494) and
    the deviatoric solid force (:504-514), re-derived exactly as
    `_pass_a_offset` does with ``defer_elastic_forces=True`` dropping them
    from the main loop.  Both are EXACTLY zero for every pair unless one
    side has AS != 0 or S != 0 — i.e. unless an elastic lane
    (`pair_pallas._elastic_lanes`) sits inside the block's stencil window —
    so the rowloop kernel runs this only on window-gated blocks.  Returns
    the cj-reduced [3, ci, NC] force slab to add into the f accumulator."""
    f32 = I["x"].dtype
    dx = _pair_delta(I["x"], J["x"], pbc)
    r = jnp.sqrt(_dot3(dx, dx))
    mask = (I["valid"] & J["valid"] & notself).astype(f32)
    inv_h = coeffs["inv_h"]
    wfd = lucy_wfd_ih(r, inv_h, cfg.dim) * mask
    wf = lucy_w_ih(r, inv_h, cfg.dim) * mask
    mi, mj = I["m"], J["m"]
    as_coef = mi * mj * wfd * (wf * coeffs["inv_wdelta"]) ** 4
    f = as_coef[None] * _xdot_tensor(dx, I["AS"] + J["AS"])
    if cfg.free_solids_present:
        # the deviatoric part of the solid-branch force; the rest of that
        # branch (fviscs, fpair) stays in the main loop where the
        # solid_i select is applied
        inv_i = I["inv_rho"] * I["inv_rho"]
        inv_j = J["inv_rho"] * J["inv_rho"]
        Ssum = I["S"] * inv_i[None, None] + J["S"] * inv_j[None, None]
        f_dev = (mi * mj * wfd)[None] * _xdot_tensor(dx, Ssum)
        f = f + jnp.where(I["solid"][None], f_dev, 0.0)
    return jnp.sum(f, axis=-2)


def _pass_a_offset(I, J, coeffs, params: Params, cfg: PairConfig, dt, step, notself, acc, seed=0, pbc=(), defer_elastic_forces=False):
    """Accumulate all sweep-1/2 terms for one stencil offset into ``acc``.

    Pair blocks are [ci, cj, NC] (components leading); reductions are over
    the cj axis (axis -2 of the scalar block).  ``coeffs`` holds the
    per-pair coefficient tables already looked up for this offset's type
    pairs (h, eta, hc, kap, kss) — the jnp driver gathers them from the
    Params tables; the Pallas driver builds them with select chains
    (dynamic gathers are not available inside Mosaic kernels).

    ``defer_elastic_forces``: drop the artificial-stress and deviatoric
    force terms — the rowloop kernel evaluates them in the window-gated
    elastic pass instead (`_pass_a_elastic_f_offset`); only valid when
    ``cfg.elastic_present`` (the caller must add that pass's contribution).
    """
    f32 = I["x"].dtype
    dim = cfg.dim
    RED = -2  # the cj axis of a scalar pair block

    h = coeffs["h"]
    inv_h = coeffs["inv_h"]

    dx = _pair_delta(I["x"], J["x"], pbc)  # [3, ci, cj, NC]
    rsq = _dot3(dx, dx)
    r = jnp.sqrt(rsq)

    mask = (I["valid"] & J["valid"] & notself).astype(f32)
    wfd = lucy_wfd_ih(r, inv_h, dim) * mask
    wf = lucy_w_ih(r, inv_h, dim) * mask
    wfBvf = wf  # identical expression in the reference (:212-213)

    # Ghost cells beyond open boundaries are zero-padded by shift_cells, and
    # every per-particle reciprocal (inv_rho, m_rho, P_rho2) is precomputed
    # on the finite state, so no j-side value can be inf/nan — masked terms
    # vanish under the (wfd, wf) mask without extra selects.
    mi = I["m"]
    mj = J["m"]
    rhoi = I["rho"]
    rhoj = J["rho"]
    Vi2, Vj2 = I["V2"], J["V2"]
    solid_i, solid_j = I["solid"], J["solid"]

    # ---- sweep 1 ----------------------------------------------------------
    acc["num_den"] += jnp.sum(Vj2 * wfBvf, axis=RED)
    # Shepard-filter accumulators: consumed by final_integrate only on
    # steps where step % freq_filter == 0, so the stepper runs the
    # 19-of-20 steps in between with density_filter_accs=False — exactly
    # dead work elided (measured 7.2% of the flagship kernel, round 5).
    # Integrators that never filter (fsi's 1e16 cadence, plain bvf) get
    # the flag False for every step at Scene.build.
    if getattr(cfg, "density_filter_accs", True):
        acc["rhoAux1"] += jnp.sum(J["rhoI"] * wfBvf, axis=RED)
        acc["rhoAux2"] += jnp.sum(wfBvf, axis=RED)
    # background-pressure velocity correction, Adami 2013 (:252-254);
    # wfd2 == wfd because hRatio is hardcoded 1.0 (:186,:214).
    ddv_coef = 10.0 * 7.0 * I["B"] * (Vi2 + Vj2) * wfd
    acc["ddv"] += jnp.sum(ddv_coef[None] * dx, axis=RED)
    if cfg.xsph:
        dvest_ji = J["vest"] - I["vest"]
        acc["ddx"] += jnp.sum((Vj2 * wf)[None] * dvest_ji, axis=RED)

    # ---- sweep 2 ----------------------------------------------------------
    velvec = I["vest"] - J["vest"]  # momentum-velocity difference [3, ...]
    delVdotDelR = _dot3(dx, velvec)

    # transport tensor force (:370-377): ft[m] = (Vi2+Vj2) wfd sum_n T[m,n] dx[n]
    # with T[m,n] = 0.5 (rho_i vest_i[m] (v_i[n]-vest_i[n]) + rho_j ...).
    b_i_dot_dx = _dot3(I["v"] - I["vest"], dx)
    b_j_dot_dx = _dot3(J["v"] - J["vest"], dx)
    tdotx = 0.5 * (
        (rhoi * b_i_dot_dx)[None] * I["vest"]
        + (rhoj * b_j_dot_dx)[None] * J["vest"]
    )
    ftransport = ((Vi2 + Vj2) * wfd)[None] * tdotx

    # inter-particle viscosity, Adami 2013 (:387)
    fvisc = (Vi2 + Vj2) * coeffs["eta"] * wfd

    # pressure force, Zhang 2017 (+ Sun 2018 switch in the tv variant, :395-399)
    fi_term = I["P_rho2"]
    fj_term = J["P_rho2"]
    pij = fj_term + fi_term
    if cfg.pressure_switch:
        sgn = jnp.where((pij >= 0.0) | (solid_i & solid_j), 1.0, -1.0)
        fpair = mi * mj * (fj_term + sgn * fi_term) * wfd
    else:
        fpair = mi * mj * pij * wfd

    # SDPD thermal random force (:406-431)
    if cfg.thermal:
        f_random = _thermal_force(I, J, dx, r, h, wfd, params, cfg, dt, step, seed)
    else:
        f_random = 0.0

    # artificial-stress force (:486-494): fa[m] = mi mj wfd (wf/wdelta)^4
    #   * sum_k dx[k] (AS_i[k,m] + AS_j[k,m])
    if cfg.solids_present and not defer_elastic_forces:
        as_coef = mi * mj * wfd * (wf * coeffs["inv_wdelta"]) ** 4
        if cfg.elastic_present:
            xdotAS = _xdot_tensor(dx, I["AS"] + J["AS"])
            f_art = as_coef[None] * xdotAS
        else:
            # diagonal tensor (see _per_particle): x.(AS_i+AS_j) = (as_i+as_j) dx
            f_art = (as_coef * (I["ASd"] + J["ASd"]))[None] * dx
    else:
        f_art = 0.0

    # fluid-branch force (:497-501)
    f_fluid = (-fpair)[None] * dx + fvisc[None] * velvec + ftransport + f_art
    if cfg.thermal:
        f_fluid = f_fluid + f_random

    if cfg.solids_present and cfg.free_solids_present:
        # solid-branch force (:504-529)
        if cfg.elastic_present and not defer_elastic_forces:
            inv_i = I["inv_rho"] * I["inv_rho"]
            inv_j = J["inv_rho"] * J["inv_rho"]
            Ssum = I["S"] * inv_i[None, None] + J["S"] * inv_j[None, None]
            f_dev = (mi * mj * wfd)[None] * _xdot_tensor(dx, Ssum)
        else:
            f_dev = 0.0
        # Pereira 2017 artificial viscosity for solids (:516-522)
        mu = h * delVdotDelR / (rsq + 0.01 * h * h)
        fviscs = jnp.where(
            delVdotDelR < 0.0,
            mi * mj * wfd * (-(I["c0"] + J["c0"]) * mu + 2.0 * mu * mu)
            / (rhoi + rhoj),
            0.0,
        )
        f_solid = (-fpair - fviscs)[None] * dx + f_dev + f_art
        fsum = jnp.where(solid_i[None], f_solid, f_fluid)
    else:
        fsum = f_fluid
    acc["f"] += jnp.sum(fsum, axis=RED)
    if "vir" in acc:
        # pairwise virial r_ij . f_ij (the full-neighbor analog of LAMMPS
        # Pair::ev_tally's v_tally, pair.cpp; each pair appears twice over
        # i, so the global virial is 0.5 * sum_i of this row)
        acc["vir"] += jnp.sum(_dot3(dx, fsum), axis=RED)

    # Jaumann deviatoric stress rate (:433-451).  The "dS" key check lets
    # the rowloop kernel run this block in a separate per-block elastic-
    # gated pass (_pass_a_dS_offset below) instead of the main loop.
    if cfg.elastic_present and "dS" in acc:
        acc["dS"] += jnp.sum(_pass_a_dS(I, J, coeffs, cfg, dx, wfd), axis=RED)

    # density evolution, "new density formulation" (:547-555)
    dvt = I["v"] - J["v"]  # transport-velocity difference
    delVtdotDelR = _dot3(dx, dvt)
    corr_i = rhoi * _dot3(I["vest"] - I["v"], dx)
    corr_j = rhoj * _dot3(J["vest"] - J["v"], dx)
    m_rho_j = J["m_rho"]
    drho = rhoi * delVtdotDelR * wfd * m_rho_j
    if cfg.ampl_damp != 0.0:
        # rhoi (rhoj/rhoi - 1) / rhoj == (rhoj - rhoi) m_rho_j / mj, algebraic
        # rewrite of pair...fsi.cpp:535 with the hoisted reciprocal
        drho = drho - (
            cfg.ampl_damp
            * h
            * I["c0"]
            * 2.0
            * (rhoj - rhoi)
            * (rsq / (rsq + 0.01 * h * h))
            * wfd
            * m_rho_j
        )
    drho = drho - m_rho_j * (corr_i + corr_j) * wfd
    acc["drho"] += jnp.sum(drho, axis=RED)

    # energy accumulation (:557-559)
    acc["de"] += jnp.sum(
        -0.5 * (fpair * delVdotDelR + fvisc * _dot3(velvec, velvec)), axis=RED
    )

    # BVF volume fraction and wall normal (:562-576)
    if cfg.solids_present:
        fs = (I["fluid"] & solid_j).astype(f32)
        acc["phi"] += jnp.sum(fs * Vj2 * wfBvf, axis=RED)
        acc["nw"] += jnp.sum((fs * wfd * Vj2)[None] * dx, axis=RED)

    # species transport, Tartakovsky 2007 (:677-731); separate cutoff cutc.
    # The "Qd" key check mirrors the "dS" one: the Pallas kernels carry no
    # Qd accumulator — their SSA configs draw the hops in the separate jnp
    # pass `_pass_a_qd` (bit-identical streams via `_qd_hops`).
    want_qd = params.n_ssa > 0 and "Qd" in acc
    if params.n_sdpd > 0 or want_qd:
        hc = coeffs["hc"]
        wfd_c = lucy_wfd_ih(r, coeffs["inv_hc"], dim) * mask
        # (rhoi+rhoj)/(rhoi rhoj) == 1/rhoi + 1/rhoj; m_i m_j/(m_i+m_j) is a
        # per-type-pair table (both hoisted out of the pair loop)
        dQc_base = (
            2.0
            * coeffs["m_harm"]
            * (I["inv_rho"] + J["inv_rho"])
            * rsq
            * wfd_c
            / (rsq + 0.01 * hc * hc)
        )
    if params.n_sdpd > 0:
        kap = coeffs["kap"]  # [Ns, ci, cj, NC]
        dQ = kap * (I["C"] - J["C"]) * dQc_base[None]
        if cfg.species_advection:
            # advection correction (tv only, :714-715):
            # -(mj/rhoj) (C_i (vest_i-v_i).dx + C_j (vest_j-v_j).dx) wfd_c
            corr_ip = _dot3(I["vest"] - I["v"], dx)
            corr_jp = _dot3(J["vest"] - J["v"], dx)
            dQ = dQ - (J["m_rho"] * wfd_c)[None] * (
                I["C"] * corr_ip[None] + J["C"] * corr_jp[None]
            )
        acc["Q"] += jnp.sum(dQ, axis=RED)

    # stochastic diffusion hops (core/ssa.py; reference fills the D-matrix
    # here and runs a serial Gillespie afterwards, :721-809)
    if want_qd:
        acc["Qd"] += jnp.sum(
            _qd_hops(I, J, coeffs, params, cfg, dt, step, seed, dQc_base),
            axis=RED,
        ).astype(jnp.int32)

    return acc


def _qd_hops(I, J, coeffs, params: Params, cfg: PairConfig, dt, step, seed,
             dQc_base):
    """Per-offset stochastic hop balance [n_ssa, ci, cj, NC] — the
    counter-based tau-leap re-derivation of the reference's D-matrix fill +
    serial Gillespie (pair...transport_velocity.cpp:739-809); the caller
    reduces over cj.  Shared verbatim between the jnp fallback
    (`_pass_a_offset`) and the kernel-split Qd pass (`_pass_a_qd`) so both
    paths draw bit-identical streams."""
    from sph_bvf_tpu.core.ssa import pair_hop_counts

    f32 = dQc_base.dtype
    kss = coeffs["kss"]  # [Nssa, ci, cj, NC]
    lam = kss * (-dQc_base)[None] * dt  # per-molecule hop prob rate
    sp = jnp.arange(params.n_ssa, dtype=jnp.uint32).reshape(
        (params.n_ssa,) + (1,) * dQc_base.ndim
    )
    seed_w = jnp.uint32(cfg.rng_seed) ^ jnp.asarray(seed, jnp.uint32)
    n_out = pair_hop_counts(
        lam * I["Cd"].astype(f32), seed_w, step,
        I["tag"], J["tag"], sp, cfg.ssa_poisson_terms,
    )
    n_in = pair_hop_counts(
        lam * J["Cd"].astype(f32), seed_w, step,
        J["tag"], I["tag"], sp, cfg.ssa_poisson_terms,
    )
    return n_in - n_out


def _pass_a_qd(pf, I, not_diag, params: Params, geom: Geometry,
               cfg: PairConfig, dt, step, seed, pbc):
    """Qd-only stencil pass: the SSA hop draws as a slim jnp/XLA loop over
    the stencil offsets, run AFTER the Pallas kernel computed the mechanics
    (the kernel split — the draws need per-pair RNG streams keyed by tags
    and species counts, which would double the kernel's VMEM working set).
    Reduction order per offset matches the fallback, so Qd is bit-identical
    to the pure-jnp path."""
    NC, cap = geom.ncells_total, geom.cap
    f32 = pf["x"].dtype
    need = ("x", "valid", "ptype", "inv_rho", "Cd", "tag")
    qd = jnp.zeros((params.n_ssa, cap, NC), jnp.int32)
    for off in geom.stencil_offsets():
        J = {k: _bc(shift_cells(pf[k], off, geom), "j") for k in need}
        notself = not_diag if off == (0, 0, 0) else True
        coeffs = lookup_pair_coeffs(I["ptype"], J["ptype"], params, cfg)
        dx = _pair_delta(I["x"], J["x"], pbc)
        rsq = _dot3(dx, dx)
        r = jnp.sqrt(rsq)
        mask = (I["valid"] & J["valid"] & notself).astype(f32)
        wfd_c = lucy_wfd_ih(r, coeffs["inv_hc"], cfg.dim) * mask
        hc = coeffs["hc"]
        dQc_base = (
            2.0
            * coeffs["m_harm"]
            * (I["inv_rho"] + J["inv_rho"])
            * rsq
            * wfd_c
            / (rsq + 0.01 * hc * hc)
        )
        qd = qd + jnp.sum(
            _qd_hops(I, J, coeffs, params, cfg, dt, step, seed, dQc_base),
            axis=-2,
        ).astype(jnp.int32)
    return qd


def _thermal_force(I, J, dx, r, h, wfd, params: Params, cfg: PairConfig, dt, step, seed=0):
    """SDPD random force (pair...transport_velocity.cpp:406-431).

    Wiener increment: symmetric dim x dim gaussian matrix, then traceless;
    prefactor sqrt(-4 kB e_i mi mj wfd / (rho_i rho_j dt)) / (r + 0.01 h).
    Noise is pair-symmetric via counter-based hashing (see ops/rand.py).
    """
    dim = cfg.dim
    # build symmetric wiener matrix entries for the upper triangle
    W = [[None] * 3 for _ in range(3)]
    salt = 0
    for a in range(dim):
        for b in range(a, dim):
            g = rand.pair_symmetric_normal(
                jnp.uint32(cfg.rng_seed) ^ jnp.asarray(seed, jnp.uint32),
                step, I["tag"], J["tag"], salt,
            )
            W[a][b] = g
            W[b][a] = g
            salt += 1
    # reference symmetrizes off-diagonals by averaging two draws; a single
    # shared draw has the same distribution (documented deviation).
    trace = sum(W[a][a] for a in range(dim)) / dim
    for a in range(dim):
        W[a][a] = W[a][a] - trace
    # m_i m_j wfd / (rho_i rho_j) via the hoisted reciprocals: zero (not
    # inf/nan) on zero-padded ghost lanes, so the mask in wfd suffices
    pref = jnp.sqrt(
        jnp.maximum(
            -4.0
            * params.boltz
            * I["e"]
            * (I["m"] * J["m"] * wfd * I["inv_rho"] * J["inv_rho"])
            / dt,
            0.0,
        )
    ) / (r + 0.01 * h)
    comps = []
    for l in range(3):
        if l < dim:
            s = sum(W[l][k] * dx[k] for k in range(dim))
            comps.append(pref * s)
        else:
            comps.append(jnp.zeros_like(r))
    return jnp.stack(comps, axis=0)


@partial(jax.jit, static_argnames=("geom", "cfg"))
def compute_pair_virial(state: State, params: Params, geom: Geometry,
                        cfg: PairConfig):
    """Per-particle pairwise virial sum_j r_ij . f_ij as [cap, NC].

    Feeds the thermo ``press`` keyword (thermo.cpp:56 -> compute pressure):
    P = (sum m v^2 + 0.5 sum_i vir_i) / (dim V).  Runs the jnp offset loop
    at thermo cadence only — never in the hot step — so the Pallas kernels
    stay free of the extra accumulator.
    """
    NC, cap = geom.ncells_total, geom.cap
    f32 = state.x.dtype
    pf = _per_particle(state, params, cfg)
    I = {k: _bc(v, "i") for k, v in pf.items()}
    not_diag = ~(
        jnp.arange(cap)[:, None] == jnp.arange(cap)[None, :]
    )[:, :, None]
    pbc = tuple(
        (ax, geom.hi[ax] - geom.lo[ax])
        for ax in range(3)
        if geom.periodic[ax] and geom.ncells[ax] > 1
    )

    def zeros(*lead):
        return jnp.zeros(lead + (cap, NC), f32)

    acc = dict(
        num_den=zeros(), rhoAux1=zeros(), rhoAux2=zeros(),
        ddv=zeros(3), ddx=zeros(3), f=zeros(3), dS=zeros(3, 3),
        drho=zeros(), de=zeros(), phi=zeros(), nw=zeros(3),
        Q=jnp.zeros((params.n_sdpd, cap, NC), f32),
        Qd=jnp.zeros((params.n_ssa, cap, NC), jnp.int32),
        vir=zeros(),
    )
    ja_fields = _pass_a_j_fields(params, cfg)
    for off in geom.stencil_offsets():
        J = {k: _bc(shift_cells(pf[k], off, geom), "j") for k in ja_fields}
        notself = not_diag if off == (0, 0, 0) else True
        coeffs = lookup_pair_coeffs(I["ptype"], J["ptype"], params, cfg)
        acc = _pass_a_offset(
            I, J, coeffs, params, cfg, state.dt, state.step, notself, acc,
            seed=state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1],
            pbc=pbc,
        )
    return jnp.where(state.valid, acc["vir"], 0.0)


@partial(jax.jit, static_argnames=("geom", "cfg"))
def compute_ssa_mu_max(state: State, params: Params, geom: Geometry,
                       cfg: PairConfig):
    """Max per-directed-pair hop mean mu = kappaSSA * (-dQc_base) * Cd * dt.

    The tau-leap diffusion (core/ssa.py) truncates the per-pair Poisson at
    ``cfg.ssa_poisson_terms`` and is statistically exact only for mu << 1;
    the reference's sequential Gillespie has no such regime limit.  This
    diagnostic runs at check cadence (core/stepper.simulate) so a user with
    too large a dt gets a loud warning instead of silently clipped tails.
    Jitted (one compiled program per shape): an eager stencil loop through
    a tunneled TPU backend would dispatch hundreds of ~1s ops.
    """
    if params.n_ssa == 0:
        return jnp.zeros((), state.x.dtype)
    f32 = state.x.dtype
    pf = _per_particle(state, params, cfg)
    I = {k: _bc(v, "i") for k, v in pf.items()}
    not_diag = ~(
        jnp.arange(geom.cap)[:, None] == jnp.arange(geom.cap)[None, :]
    )[:, :, None]
    pbc = tuple(
        (ax, geom.hi[ax] - geom.lo[ax])
        for ax in range(3)
        if geom.periodic[ax] and geom.ncells[ax] > 1
    )
    mu_max = jnp.zeros((), f32)
    for off in geom.stencil_offsets():
        J = {
            k: _bc(shift_cells(pf[k], off, geom), "j")
            for k in ("valid", "x", "rho", "inv_rho", "ptype")
        }
        notself = not_diag if off == (0, 0, 0) else True
        coeffs = lookup_pair_coeffs(I["ptype"], J["ptype"], params, cfg)
        dx = _pair_delta(I["x"], J["x"], pbc)
        rsq = _dot3(dx, dx)
        r = jnp.sqrt(rsq)
        mask = (I["valid"] & J["valid"] & notself).astype(f32)
        hc = coeffs["hc"]
        wfd_c = lucy_wfd_ih(r, coeffs["inv_hc"], cfg.dim) * mask
        dQc_base = (
            2.0 * coeffs["m_harm"] * (I["inv_rho"] + J["inv_rho"])
            * rsq * wfd_c / (rsq + 0.01 * hc * hc)
        )
        mu = coeffs["kss"] * (-dQc_base)[None] * state.dt * jnp.maximum(
            I["Cd"].astype(f32), 0.0
        )
        mu_max = jnp.maximum(mu_max, jnp.max(mu))
    return mu_max


# ---------------------------------------------------------------------------
# pass B: sweep 3 (weighted solid velocity/acceleration near fluids)
# ---------------------------------------------------------------------------


def _pass_b_offset(I, J, coeffs, cfg: PairConfig, params: Params, notself, acc, pbc=()):
    f32 = I["x"].dtype
    RED = -2
    dx = _pair_delta(I["x"], J["x"], pbc)
    r = jnp.sqrt(_dot3(dx, dx))
    mask = (I["valid"] & J["valid"] & notself).astype(f32)
    wfBvf = lucy_w_ih(r, coeffs["inv_h"], cfg.dim) * mask

    sel = I["fluid"] & J["solid"]
    if cfg.weighted_solid_skip_fixed:
        sel = sel & ~J["fixed"]
    w = sel.astype(f32) * wfBvf * J["V2"]
    acc["vws"] += jnp.sum(w[None] * J["vest"], axis=RED)
    acc["aws"] += jnp.sum(w[None] * J["fom"], axis=RED)  # f/m, hoisted
    return acc


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _pass_a_j_fields(params: Params, cfg: PairConfig):
    fields = (
        "valid x v vest rho rhoI ptype solid m c0 "
        "P_rho2 inv_rho m_rho V2"
    ).split()
    if cfg.solids_present:
        fields.append("AS" if cfg.elastic_present else "ASd")
    if cfg.elastic_present:
        fields.append("S")
        if cfg.g0_chem_coupling:
            fields.append("G0")
    if params.n_sdpd > 0:
        fields.append("C")
    if cfg.thermal and "tag" not in fields:
        fields.append("tag")
    if params.n_ssa > 0:
        fields += [f for f in ("Cd", "tag") if f not in fields]
    return fields


_PASS_B_J_FIELDS = "valid x vest ptype solid fluid fixed V2 fom".split()


def compute_forces(
    state: State, params: Params, geom: Geometry, cfg: PairConfig,
    mesh=None, mesh_axis: str = "x",
) -> State:
    """Full force evaluation; returns the state with all accumulators replaced.

    Equivalent of `PairSsaTsdpd*::compute` plus the preceding `force_clear`
    (atom_vec_ssa_tsdpd_atomic.cpp:391-424, verlet.cpp:370).

    With ``mesh`` (and more than one device on ``mesh_axis``), pass A runs
    as per-device Pallas kernels under shard_map with ppermute halo
    exchange (ops/pair_pallas.pass_a_sharded) — compiled on TPU, interpret
    mode elsewhere (the virtual-CPU dryrun).  Pass B and the jnp fallback
    shard via GSPMD as before.
    """
    NC, cap = geom.ncells_total, geom.cap
    f32 = state.x.dtype
    pf = _per_particle(state, params, cfg)
    I = {k: _bc(v, "i") for k, v in pf.items()}

    # self-pair exclusion for the zero offset ([cap, cap, 1])
    not_diag = ~(
        jnp.arange(cap)[:, None] == jnp.arange(cap)[None, :]
    )[:, :, None]

    # minimum-image shifts for periodic axes (static)
    pbc = tuple(
        (ax, geom.hi[ax] - geom.lo[ax])
        for ax in range(3)
        if geom.periodic[ax] and geom.ncells[ax] > 1
    )

    def zeros(*lead):
        return jnp.zeros(lead + (cap, NC), f32)

    acc = dict(
        num_den=zeros(),
        rhoAux1=zeros(),
        rhoAux2=zeros(),
        ddv=zeros(3),
        ddx=zeros(3),
        f=zeros(3),
        dS=zeros(3, 3),
        drho=zeros(),
        de=zeros(),
        phi=zeros(),
        nw=zeros(3),
        Q=jnp.zeros((params.n_sdpd, cap, NC), f32),
        Qd=jnp.zeros((params.n_ssa, cap, NC), jnp.int32),
    )

    from sph_bvf_tpu.ops.pair_pallas import (
        kernel_supported,
        on_tpu,
        pallas_eligible,
        pass_a_pallas,
        pass_a_sharded,
        sharded_eligible,
    )

    n_shards = mesh.shape[mesh_axis] if mesh is not None else 1
    kernel_used = True
    if (
        n_shards > 1
        and cfg.use_pallas
        and kernel_supported(state, params, geom, cfg)
        and sharded_eligible(geom, n_shards)
    ):
        acc.update(
            pass_a_sharded(
                pf, params, geom, cfg, mesh, mesh_axis,
                interpret=not on_tpu(),
                dt=state.dt, step=state.step,
                seed=state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1],
            )
        )
    elif cfg.use_pallas and pallas_eligible(state, params, geom, cfg):
        acc.update(pass_a_pallas(
            pf, params, geom, cfg,
            dt=state.dt, step=state.step,
            seed=state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1],
        ))
    else:
        kernel_used = False
        ja_fields = _pass_a_j_fields(params, cfg)
        for off in geom.stencil_offsets():
            J = {k: _bc(shift_cells(pf[k], off, geom), "j") for k in ja_fields}
            notself = not_diag if off == (0, 0, 0) else True
            coeffs = lookup_pair_coeffs(I["ptype"], J["ptype"], params, cfg)
            acc = _pass_a_offset(
                I, J, coeffs, params, cfg, state.dt, state.step, notself, acc,
                seed=state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1],
                pbc=pbc,
            )

    if kernel_used and params.n_ssa > 0:
        # SSA kernel split: the kernel computed the mechanics (it carries
        # no Qd accumulator); draw the hops in the slim jnp pass — Qd is
        # bit-identical to the fallback path's (same counter streams)
        acc["Qd"] = _pass_a_qd(
            pf, I, not_diag, params, geom, cfg, state.dt, state.step,
            state.key.reshape(-1)[0] ^ state.key.reshape(-1)[-1], pbc,
        )

    # ---- pass B needs the fresh forces ------------------------------------
    # vws/aws are consumed ONLY by the plain-bvf and zhang integrators'
    # moving-wall reflections (fix_ssa_tsdpd_bvf.cpp:276-292,
    # fix_ssa_tsdpd_bvf_zhang.cpp:341-343); the reference pair styles
    # compute sweep 3 unconditionally but the tv/mechanics/fsi integrators
    # never read it, so it is skipped unless requested.
    acc_b = dict(vws=zeros(3), aws=zeros(3))
    if cfg.solids_present and cfg.weighted_solid:
        pf_b = {k: pf[k] for k in _PASS_B_J_FIELDS if k != "fom"}
        pf_b["fom"] = acc["f"] / pf["m"][None]  # f/m once per particle
        I_b = {k: _bc(v, "i") for k, v in pf_b.items()}
        for off in geom.stencil_offsets():
            J = {
                k: _bc(shift_cells(pf_b[k], off, geom), "j")
                for k in _PASS_B_J_FIELDS
            }
            notself = not_diag if off == (0, 0, 0) else True
            coeffs = lookup_pair_coeffs(I_b["ptype"], J["ptype"], params, cfg)
            acc_b = _pass_b_offset(
                I_b, J, coeffs, cfg, params, notself, acc_b, pbc=pbc
            )

    return dataclasses.replace(
        state,
        f=acc["f"],
        drho=acc["drho"],
        de=acc["de"],
        Q=acc["Q"],
        Qd=acc["Qd"],
        ddv=acc["ddv"],
        ddx=acc["ddx"],
        dS=acc["dS"],
        phi=acc["phi"],
        num_den=jnp.where(state.valid, acc["num_den"], 1.0),
        nw=acc["nw"],
        vws=acc_b["vws"],
        aws=acc_b["aws"],
        rhoAux1=acc["rhoAux1"],
        rhoAux2=jnp.where(state.valid, acc["rhoAux2"], 1.0),
        Pnew=pf["P"] if cfg.store_pnew else state.Pnew,
    )
