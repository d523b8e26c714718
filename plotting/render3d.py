"""Exact 3-D rendering primitives without pyvista.

The reference raytraces tissue surfaces and plane slices with pyvista
(plotting/plot_roi.py:45-305).  pyvista is absent in this environment;
this module provides the two primitives its figures are built from,
computed exactly from the DiscreteGeometry arrays:

* :func:`plane_slice` — marching-tetrahedra cross-section: every tet
  crossing the plane contributes its exact intersection polygon
  (triangle or quad), optionally colored by a linearly interpolated
  vertex field.  Drawn as a filled matplotlib PolyCollection — the
  analog of pyvista ``grid.slice(normal, origin)``.
* :func:`membrane_surface` — the membrane interface triangles as a
  mpl_toolkits Poly3DCollection with per-subdomain color conventions
  (or a per-vertex scalar field), z-sorted — the analog of the
  reference's surface renderings.

Everything is vectorized numpy; no per-cell Python loops.
"""

from __future__ import annotations

import numpy as np

# Reference subdomain color conventions (plot_roi.py:9-14)
SUB_COLORS = {0: "#4e5f70", 1: "#16a085", 2: "#ff67ff", 3: "#00ff00"}

_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
)


def _tet_plane_polys(pts, vals, s):
    """Intersection polygons of tets with the plane s(x)=0.

    pts: (nc, 4, 3) tet vertex coordinates; vals: (nc, 4) vertex field
    (may be None); s: (nc, 4) signed plane distances.  Returns
    (polys (np, k, 3), pvals (np,)) with k in {3, 4} handled by two
    fixed-pattern groups; quad vertices are emitted in cyclic order.
    """
    s = np.where(s == 0.0, 1e-30, s)
    below = s < 0.0
    count = below.sum(axis=1)
    polys, pvals = [], []

    # Triangle case: one vertex isolated on one side -> 3 edge crossings
    for iso_below in (True, False):
        m = count == (1 if iso_below else 3)
        if not m.any():
            continue
        P, S = pts[m], s[m]
        V = vals[m] if vals is not None else None
        iso = np.argmax(below[m] == iso_below, axis=1)  # (n,)
        others = np.argsort(
            np.eye(4, dtype=bool)[iso], axis=1, kind="stable"
        )[:, :3]  # the three non-isolated vertex slots
        # build per-cell pairs (iso, other_k): interpolate manually since
        # pairs differ per cell
        si = np.take_along_axis(S, iso[:, None], axis=1)  # (n,1)
        so = np.take_along_axis(S, others, axis=1)  # (n,3)
        t = si / (si - so)  # (n,3)
        Pi = np.take_along_axis(P, iso[:, None, None].repeat(3, 2), axis=1)
        Po = np.take_along_axis(P, others[..., None].repeat(3, 2), axis=1)
        tri = Pi + t[..., None] * (Po - Pi)  # (n,3,3)
        polys.append(tri)
        if V is not None:
            vi = np.take_along_axis(V, iso[:, None], axis=1)
            vo = np.take_along_axis(V, others, axis=1)
            pvals.append((vi + t * (vo - vi)).mean(axis=1))

    # Quad case: 2-2 split -> 4 edge crossings in cyclic order
    m = count == 2
    if m.any():
        P, S = pts[m], s[m]
        V = vals[m] if vals is not None else None
        b = below[m]
        order = np.argsort(~b, axis=1, kind="stable")  # below first
        a0, a1 = order[:, 0], order[:, 1]
        b0, b1 = order[:, 2], order[:, 3]

        def _ip(ii, jj):
            si = np.take_along_axis(S, ii[:, None], axis=1)
            sj = np.take_along_axis(S, jj[:, None], axis=1)
            t = si / (si - sj)
            Pi = np.take_along_axis(P, ii[:, None, None].repeat(3, 2), 1)
            Pj = np.take_along_axis(P, jj[:, None, None].repeat(3, 2), 1)
            p = Pi + t[..., None] * (Pj - Pi)
            v = None
            if V is not None:
                vi = np.take_along_axis(V, ii[:, None], axis=1)
                vj = np.take_along_axis(V, jj[:, None], axis=1)
                v = vi + t * (vj - vi)
            return p[:, 0], (v[:, 0] if v is not None else None)

        p00, v00 = _ip(a0, b0)
        p01, v01 = _ip(a0, b1)
        p11, v11 = _ip(a1, b1)
        p10, v10 = _ip(a1, b0)
        quad = np.stack([p00, p01, p11, p10], axis=1)  # cyclic
        polys.append(quad)
        if vals is not None:
            pvals.append(np.stack([v00, v01, v11, v10], 1).mean(axis=1))

    if not polys:
        return [], None
    return polys, (pvals if vals is not None else None)


def plane_slice(ax, geom, axis, origin, fields=None, cmap="jet",
                vmin=None, vmax=None, tags=None, ecs_alpha=1.0):
    """Draw the exact cross-section of the tagged subdomains through the
    plane x[axis] = origin[axis] as filled polygons on a 2-D axes.

    fields: optional {tag: (n_dofs_tag,) vertex array} — subdomains with
    an entry are colored by the interpolated field, the rest by the
    reference subdomain colors.  Returns the last field PolyCollection
    (for a colorbar) or None.
    """
    from matplotlib.collections import PolyCollection

    keep = [d for d in range(3) if d != axis]
    o = float(np.asarray(origin)[axis])
    mappable = None
    for t, sub in sorted(geom.subdomains.items()):
        if tags is not None and t not in tags:
            continue
        pts = sub.coords[sub.cells]  # (nc, 4, 3)
        s = pts[:, :, axis] - o
        # vertices exactly on the plane (structured meshes: a grid plane)
        # are nudged to the + side so each shared face is drawn exactly
        # once, by the cell on the - side
        s = np.where(s == 0.0, 1e-30, s)
        cross = (s.min(axis=1) < 0) & (s.max(axis=1) > 0)
        if not cross.any():
            continue
        f = None if fields is None else fields.get(t)
        vals = None if f is None else np.asarray(f)[sub.cells][cross]
        polys, pvals = _tet_plane_polys(pts[cross], vals, s[cross])
        for k, poly3 in enumerate(polys):
            poly2 = poly3[:, :, keep]
            if pvals is not None:
                pc = PolyCollection(poly2, cmap=cmap, edgecolors="face",
                                    linewidths=0.2, antialiaseds=False)
                pc.set_array(pvals[k])
                if vmin is not None or vmax is not None:
                    pc.set_clim(vmin, vmax)
                mappable = pc
            else:
                c = SUB_COLORS.get(t, "#999999")
                pc = PolyCollection(
                    poly2, facecolors=c, edgecolors=c,
                    linewidths=0.2, antialiaseds=False,
                    alpha=ecs_alpha if t == 0 else 1.0,
                )
            ax.add_collection(pc)
    ax.autoscale_view()
    return mappable


def membrane_surface(ax3, geom, tags=None, fields=None, cmap="jet",
                     vmin=None, vmax=None, clip=None, alpha=1.0,
                     linewidth=0.0):
    """Render membrane interface triangles on a 3-D axes.

    tags: membrane tags to draw (default all).  fields: optional
    {tag: (n_mem_dofs,) array} per-membrane vertex scalars (e.g. phi_M
    or local ECS width) — facets are colored by their vertex mean.
    clip: optional (lo[3], hi[3]) box; facets with centroids outside
    are dropped (the ROI view).  Returns the last mappable for a
    colorbar, or None.
    """
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    mappable = None
    all_pts = []
    for t, mem in sorted(geom.membranes.items()):
        if tags is not None and t not in tags:
            continue
        tris = mem.coords[mem.facet_dofs]  # (n_f, 3, 3)
        m = np.ones(len(tris), bool)
        if clip is not None:
            lo, hi = np.asarray(clip[0]), np.asarray(clip[1])
            cent = tris.mean(axis=1)
            m = ((cent >= lo) & (cent <= hi)).all(axis=1)
        if not m.any():
            continue
        tc = tris[m]
        all_pts.append(tc.reshape(-1, 3))
        f = None if fields is None else fields.get(t)
        if f is not None:
            fv = np.asarray(f)[mem.facet_dofs][m].mean(axis=1)
            pc = Poly3DCollection(tc, cmap=cmap, linewidths=linewidth)
            pc.set_array(fv)
            if vmin is not None or vmax is not None:
                pc.set_clim(vmin, vmax)
            mappable = pc
        else:
            pc = Poly3DCollection(
                tc, facecolors=SUB_COLORS.get(t, "#cccccc"),
                edgecolors="k" if linewidth else "none",
                linewidths=linewidth, alpha=alpha,
            )
        pc.set_zsort("average")
        ax3.add_collection3d(pc)
    if all_pts:
        P = np.concatenate(all_pts, axis=0)
        lo, hi = P.min(axis=0), P.max(axis=0)
        c, r = 0.5 * (lo + hi), 0.5 * float((hi - lo).max()) or 1.0
        ax3.set_xlim(c[0] - r, c[0] + r)
        ax3.set_ylim(c[1] - r, c[1] + r)
        ax3.set_zlim(c[2] - r, c[2] + r)
    ax3.set_box_aspect((1, 1, 1))
    return mappable


def roi_box_outline(ax3, lo, hi, color="#ffff00", linewidth=2.0):
    """Draw the 12 edges of an axis-aligned box on a 3-D axes."""
    lo, hi = np.asarray(lo), np.asarray(hi)
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])]
    )
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
             (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
    for a, b in edges:
        ax3.plot(*np.stack([corners[a], corners[b]], 1),
                 color=color, linewidth=linewidth)
