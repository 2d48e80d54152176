"""Block-banded (bordered block-tridiagonal) assembly for general large
circuits — the structure-exploiting middle ground between the strict ladder
path (ops/banded.py, |r-c|<=1 only) and dense LU.

The reference factors the full dense MNA matrix every Newton iteration
(solver.hpp:30-80, O(N^3)); that is unusable at N=10^4.  This module is the
TPU-native replacement for large NON-ladder topologies (2-D grids, trees,
meshes):

1. at plan-build time (static, numpy) the node-equation graph is reordered
   with reverse Cuthill-McKee, compressing the node-node coupling pattern to
   half-bandwidth h;
2. high-degree "hub" nodes (supply rails, global nets) that would blow up
   the bandwidth are pulled out of the band into a dense border, together
   with the branch equations (V sources / inductors);
3. the banded interior is grouped into k=h-sized blocks, making the system
   block-tridiagonal with dense k x k blocks — the shape the MXU wants —
   solved by block cyclic reduction (ops/blockcr.py): O(nb * k^3) work,
   O(log nb) sequential depth, vs O((nb*k)^3) dense;
4. the border is eliminated with a Schur complement (mb extra right-hand
   sides through the same block-CR solve + one tiny dense solve).

Like BandedPlan, classification is static; the per-Newton-iteration work is
scatter-adds at precomputed flat indices plus the solve itself.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ----------------------------------------------------------------------
# static graph machinery (numpy, runs once at plan build)
# ----------------------------------------------------------------------

def _sym_csr(n: int, r: np.ndarray, c: np.ndarray):
    """Symmetrized, deduplicated CSR adjacency (no self loops) of the
    pattern restricted to indices < n."""
    keep = (r < n) & (c < n) & (r != c)
    rr = np.concatenate([r[keep], c[keep]])
    cc = np.concatenate([c[keep], r[keep]])
    key = np.unique(rr.astype(np.int64) * n + cc.astype(np.int64))
    rr, cc = key // n, key % n
    counts = np.bincount(rr, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return indptr, cc.astype(np.int64)


def _rcm(sub_nodes: np.ndarray, indptr, nbrs):
    """Reverse Cuthill-McKee over the subgraph induced by `sub_nodes`
    (original node indices).  Returns the ordering as original indices."""
    in_sub = np.zeros(len(indptr) - 1, bool)
    in_sub[sub_nodes] = True
    deg = np.diff(indptr)
    visited = ~in_sub.copy()
    order = []
    for seed in sub_nodes[np.argsort(deg[sub_nodes], kind="stable")]:
        if visited[seed]:
            continue
        visited[seed] = True
        queue = [int(seed)]
        qi = 0
        while qi < len(queue):
            u = queue[qi]
            qi += 1
            order.append(u)
            ns = nbrs[indptr[u]:indptr[u + 1]]
            ns = ns[~visited[ns]]
            if len(ns):
                ns = ns[np.argsort(deg[ns], kind="stable")]
                visited[ns] = True
                queue.extend(ns.tolist())
    return np.asarray(order[::-1], np.int64)


def union_pattern(engine):
    """Union of every stamp pattern the engine can emit (static DC, static
    transient, nonlinear, controlled/behavioral, transmission lines, and
    the charge-model MOS injection entries)."""
    t = engine.topo
    rows = [engine.res_rows, engine.dc_const_rows,
            engine.ind_rows, engine.mut_rows, engine.cap_rows,
            engine.nl_rows, t.node_eqs,
            engine.ctrl_rows, engine.b_static_rows,
            engine.tl_kcl_rows, engine.tl_tran_rows,
            engine.tl_dc_rows]
    cols = [engine.res_cols, engine.dc_const_cols,
            engine.ind_cols, engine.mut_cols, engine.cap_cols,
            engine.nl_cols, t.node_eqs,
            engine.ctrl_cols, engine.b_static_cols,
            engine.tl_kcl_cols, engine.tl_tran_cols,
            engine.tl_dc_cols]
    if getattr(engine, "mos_charge", False):
        rows.append(engine.mq_rows)
        cols.append(engine.mq_cols)
    return (np.concatenate(rows).astype(np.int64),
            np.concatenate(cols).astype(np.int64))


# ----------------------------------------------------------------------
# layout
# ----------------------------------------------------------------------

class BlockBandLayout:
    """Static reordering of the N unknowns into [banded interior | border].

    Attributes:
      n, m, N: node eqs / branch eqs / total unknowns (original numbering)
      k, nb, n_pad: block size, #blocks, padded interior size (nb*k)
      mb: border size (hub nodes + branch equations)
      slot_of: (N,) original eq -> interior slot [0,n_pad) or
               n_pad + border index
      f_idx / g_idx: gather indices building the permuted RHS from
               concat([I[:N], 0]) (pad slots read the zero at index N)
      sol_idx: (N,) gather indices recovering the original-order solution
               from concat([x_interior(n_pad), y_border(mb)])
    """

    def __init__(self, n: int, m: int, rows: np.ndarray, cols: np.ndarray,
                 max_block: int = 256, min_blocks: int = 4,
                 max_hubs: int = 48):
        self.n, self.m = n, m
        N = n + m
        self.N = N
        r = np.asarray(rows, np.int64)
        c = np.asarray(cols, np.int64)
        keep = (r < N) & (c < N)
        r, c = r[keep], c[keep]

        indptr, nbrs = _sym_csr(n, r[(r < n) & (c < n)], c[(r < n) & (c < n)])
        deg = np.diff(indptr)
        all_nodes = np.arange(n, dtype=np.int64)

        def layout_for(hubs: np.ndarray):
            interior_mask = np.ones(n, bool)
            interior_mask[hubs] = False
            interior = all_nodes[interior_mask]
            order = _rcm(interior, indptr, nbrs)
            pos = np.full(n, -1, np.int64)
            pos[order] = np.arange(len(order))
            nn = (r < n) & (c < n)
            nn &= interior_mask[np.where(nn, r, 0)]
            nn &= interior_mask[np.where(nn, c, 0)]
            h = int(np.abs(pos[r[nn]] - pos[c[nn]]).max()) if nn.any() else 0
            return order, pos, h

        # base layout: all nodes interior
        order0, pos0, h0 = layout_for(np.empty(0, np.int64))
        best = (order0, pos0, h0, np.empty(0, np.int64))
        # hub heuristic: nodes whose degree dwarfs the median blow up the
        # band (supply rails); try pulling them into the border
        if n:
            med = max(float(np.median(deg)), 1.0)
            # permissive candidate bar: the h1 < h0 check below only keeps
            # the border if it actually shrinks the band
            cand = all_nodes[deg >= max(8, 4 * med)]
            cand = cand[np.argsort(-deg[cand], kind="stable")][:max_hubs]
            if len(cand):
                order1, pos1, h1 = layout_for(cand)
                if h1 < h0:
                    best = (order1, pos1, h1, cand)
        order, pos, h, hubs = best

        self.h = h
        self.hubs = hubs
        k = max(h, 1)
        n_int = len(order)
        nb = max((n_int + k - 1) // k, 1)
        self.k, self.nb = k, nb
        self.n_pad = nb * k
        self.mb = len(hubs) + m
        # applicability: enough blocks that block-CR beats dense, blocks
        # small enough to live in VMEM comfortably
        self.ok = (k <= max_block) and (nb >= min_blocks)

        # slot map: interior node -> RCM slot; hubs -> border[0:len(hubs)];
        # branch eq j -> border[len(hubs)+j]
        slot_of = np.full(N, -1, np.int64)
        slot_of[order] = np.arange(n_int)
        slot_of[hubs] = self.n_pad + np.arange(len(hubs))
        slot_of[n:] = self.n_pad + len(hubs) + np.arange(m)
        self.slot_of = slot_of

        # RHS gather: Icat = concat([I[:N], 0]); pad slots -> index N
        f_idx = np.full(self.n_pad, N, np.int64)
        f_idx[slot_of[order]] = order
        border_orig = np.concatenate([hubs, np.arange(n, N)])
        self.f_idx = f_idx
        self.g_idx = border_orig
        # solution gather from concat([x_int(n_pad), y(mb)])
        sol_idx = np.empty(N, np.int64)
        sol_idx[order] = slot_of[order]
        sol_idx[border_orig] = np.arange(self.mb) + self.n_pad
        self.sol_idx = sol_idx

        # pad-slot identity entries on the D diagonal (flat indices)
        pads = np.arange(n_int, self.n_pad, dtype=np.int64)
        self._pad_eye_flat = (pads // k) * k * k + (pads % k) * k + (pads % k)
        # gmin diagonal targets: every real interior slot is a node equation
        ints = np.arange(n_int, dtype=np.int64)
        self.gmin_int_flat = (ints // k) * k * k + (ints % k) * k + (ints % k)
        # border node (hub) diagonal inside Db
        hb = np.arange(len(hubs), dtype=np.int64)
        self.gmin_bor_flat = hb * self.mb + hb

    def diag_map(self, eqs: np.ndarray):
        """Map original equation indices to flat diagonal positions:
        returns (sel_int, flat_int, sel_bor, flat_bor) so that callers can
        scatter-add per-equation diagonal values (nodeset holds etc.)."""
        eqs = np.asarray(eqs, np.int64)
        s = self.slot_of[eqs]
        is_int = s < self.n_pad
        si = s[is_int]
        flat_int = (si // self.k) * self.k * self.k \
            + (si % self.k) * self.k + (si % self.k)
        sb = s[~is_int] - self.n_pad
        flat_bor = sb * self.mb + sb
        return (np.nonzero(is_int)[0], flat_int,
                np.nonzero(~is_int)[0], flat_bor)

    def gather_rhs(self, I):
        """Permute an original-order RHS (..., >=N) into (f, g)."""
        Icat = jnp.concatenate(
            [I[..., :self.N],
             jnp.zeros(I.shape[:-1] + (1,), I.dtype)], axis=-1)
        return (jnp.take(Icat, self.f_idx, axis=-1),
                jnp.take(Icat, self.g_idx, axis=-1))

    def gather_solution(self, x_int, y):
        """Recover the original-order solution vector (..., N)."""
        xcat = jnp.concatenate([x_int, y], axis=-1)
        return jnp.take(xcat, self.sol_idx, axis=-1)


class BlockScatter:
    """Static classification of one COO pattern into the layout's target
    arrays: L/D/U (block tridiagonal, (nb,k,k) each, L[0]=U[nb-1]=0),
    Ub (n_pad, mb), Wb (mb, n_pad), Db (mb, mb)."""

    def __init__(self, layout: BlockBandLayout, rows, cols):
        self.layout = lo = layout
        N, k, nb, mb, n_pad = lo.N, lo.k, lo.nb, lo.mb, lo.n_pad
        r = np.asarray(rows, np.int64)
        c = np.asarray(cols, np.int64)
        idx = np.arange(len(r))
        keep = (r < N) & (c < N)
        r, c, idx = r[keep], c[keep], idx[keep]
        sr, sc = lo.slot_of[r], lo.slot_of[c]
        int_r, int_c = sr < n_pad, sc < n_pad

        ii = (int_r & int_c)
        bi, bj = sr[ii] // k, sc[ii] // k
        delta = bi - bj
        if len(delta) and np.abs(delta).max() > 1:
            raise ValueError("entry outside the block band — layout was "
                             "built from a narrower pattern than scattered")
        wi, wj = sr[ii] % k, sc[ii] % k
        flat = bi * k * k + wi * k + wj
        self.sel_D = idx[ii][delta == 0]
        self.idx_D = flat[delta == 0]
        self.sel_L = idx[ii][delta == 1]
        self.idx_L = flat[delta == 1]
        self.sel_U = idx[ii][delta == -1]
        self.idx_U = flat[delta == -1]

        ib = int_r & ~int_c
        self.sel_Ub = idx[ib]
        self.idx_Ub = sr[ib] * mb + (sc[ib] - n_pad)
        bi_ = ~int_r & int_c
        self.sel_Wb = idx[bi_]
        self.idx_Wb = (sr[bi_] - n_pad) * n_pad + sc[bi_]
        bb = ~int_r & ~int_c
        self.sel_Db = idx[bb]
        self.idx_Db = (sr[bb] - n_pad) * mb + (sc[bb] - n_pad)

    def scatter(self, vals, base=None):
        """vals (..., nnz) -> dict(L, D, U, Ub, Wb, Db); adds onto `base`."""
        lo = self.layout
        k, nb, mb, n_pad = lo.k, lo.nb, lo.mb, lo.n_pad
        dtype = vals.dtype
        batch = vals.shape[:-1]
        if base is None:
            D = jnp.zeros(batch + (nb * k * k,), dtype)
            # decoupled identity rows for the interior padding slots
            if len(lo._pad_eye_flat):
                D = D.at[..., lo._pad_eye_flat].add(1.0)
            out = {
                "L": jnp.zeros(batch + (nb * k * k,), dtype),
                "D": D,
                "U": jnp.zeros(batch + (nb * k * k,), dtype),
                "Ub": jnp.zeros(batch + (n_pad * mb,), dtype),
                "Wb": jnp.zeros(batch + (mb * n_pad,), dtype),
                "Db": jnp.zeros(batch + (mb * mb,), dtype),
            }
        else:
            out = {key: v.reshape(v.shape[:len(batch)] + (-1,))
                   for key, v in base.items()}
        for name, sel, tgt in (("D", self.sel_D, self.idx_D),
                               ("L", self.sel_L, self.idx_L),
                               ("U", self.sel_U, self.idx_U),
                               ("Ub", self.sel_Ub, self.idx_Ub),
                               ("Wb", self.sel_Wb, self.idx_Wb),
                               ("Db", self.sel_Db, self.idx_Db)):
            if len(sel):
                out[name] = out[name].at[..., tgt].add(vals[..., sel])
        return {
            "L": out["L"].reshape(batch + (nb, k, k)),
            "D": out["D"].reshape(batch + (nb, k, k)),
            "U": out["U"].reshape(batch + (nb, k, k)),
            "Ub": out["Ub"].reshape(batch + (n_pad, mb)),
            "Wb": out["Wb"].reshape(batch + (mb, n_pad)),
            "Db": out["Db"].reshape(batch + (mb, mb)),
        }


def get_layout(engine) -> BlockBandLayout:
    """Build (and cache on the engine) the block-band layout from the union
    stamp pattern.  Raises if the circuit does not decompose usefully."""
    cached = getattr(engine, "_blockband_layout", None)
    if cached is not None:
        return cached
    t = engine.topo
    n = t.n_node_eq
    m = t.n_unknowns - n
    rows, cols = union_pattern(engine)
    layout = BlockBandLayout(n, m, rows, cols)
    if not layout.ok:
        raise ValueError(
            f"circuit does not reduce to a useful block band "
            f"(half-bandwidth {layout.h}, {layout.nb} blocks); "
            "use the dense LU solver")
    engine._blockband_layout = layout
    return layout


def try_layout(engine):
    """get_layout that returns None instead of raising (auto-backend)."""
    try:
        return get_layout(engine)
    except ValueError:
        return None
