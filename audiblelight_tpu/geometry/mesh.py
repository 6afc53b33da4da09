"""Host-side triangle mesh: loading (GLB/OBJ/PLY), metadata, repair, generation.

TPU-native replacement for the reference's trimesh usage (worldstate.py:51-97): the
host keeps a lightweight numpy triangle soup and hands padded device arrays to the
JAX query/ray-trace kernels. Units are coerced to metres on load (glTF is metres by
spec; OBJ/PLY have no unit metadata and are assumed metres, with a heuristic warning
for likely millimetre/centimetre scans).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np

from audiblelight_tpu import config, utils
from audiblelight_tpu.utils import logger


class TriMesh:
    """An indexed triangle mesh with cached derived quantities."""

    def __init__(
        self,
        vertices: np.ndarray,
        faces: np.ndarray,
        metadata: Optional[dict] = None,
        units: str = config.MESH_UNITS,
    ):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.faces = np.asarray(faces, dtype=np.int32)
        if self.vertices.ndim != 2 or self.vertices.shape[1] != 3:
            raise ValueError(f"vertices must be (V, 3), got {self.vertices.shape}")
        if self.faces.ndim != 2 or self.faces.shape[1] != 3:
            raise ValueError(f"faces must be (F, 3), got {self.faces.shape}")
        self.metadata = metadata or {}
        self.units = units
        self._tri_cache = None
        # Optional material layer (io.gltf.MeshVisuals) attached by load_mesh
        # for texture-mapped panorama rendering; None for untextured meshes.
        self.visuals = None

    # ------------------------------------------------------------------
    # Derived quantities
    # ------------------------------------------------------------------

    @property
    def triangles(self) -> np.ndarray:
        """(F, 3, 3) triangle vertex array."""
        if self._tri_cache is None or self._tri_cache.shape[0] != len(self.faces):
            self._tri_cache = self.vertices[self.faces]
        return self._tri_cache

    @property
    def bounds(self) -> np.ndarray:
        """(2, 3) [min; max] axis-aligned bounds."""
        return np.stack([self.vertices.min(axis=0), self.vertices.max(axis=0)])

    @property
    def centroid(self) -> np.ndarray:
        """Mean of the axis-aligned bounds (matches trimesh's bounding-box centroid
        closely enough for placement heuristics)."""
        return self.vertices.mean(axis=0)

    @property
    def face_normals(self) -> np.ndarray:
        """(F, 3) unit face normals."""
        tri = self.triangles
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        return n / np.maximum(norm, 1e-30)

    @property
    def face_areas(self) -> np.ndarray:
        """(F,) triangle areas."""
        tri = self.triangles
        return 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
        )

    @property
    def area(self) -> float:
        return float(self.face_areas.sum())

    def _edge_counts(self) -> dict:
        """Count occurrences of each undirected edge."""
        f = self.faces
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        return counts

    @property
    def is_watertight(self) -> bool:
        """True when every edge is shared by exactly two faces."""
        if len(self.faces) == 0:
            return False
        return bool(np.all(self._edge_counts() == 2))

    @property
    def is_convex(self) -> bool:
        """True when every vertex lies on one side of every face plane.

        For a convex watertight enclosure (e.g. any shoebox room) no interior
        segment can intersect the surface, so occlusion tests between interior
        points are provably always false — the ray tracer uses this to skip its
        per-bounce visibility queries entirely (rir/raytracer.py).
        """
        if getattr(self, "_is_convex", None) is not None:
            return self._is_convex
        if len(self.faces) == 0 or not self.is_watertight:
            self._is_convex = False
            return False
        # O(E) local test (the old all-vertices-vs-all-planes check was O(F*V)
        # and hung on 10^5-face scans): a CONNECTED closed 2-manifold is convex
        # iff every edge's dihedral is non-reflex BOTH ways — i.e. for each
        # edge, each adjacent face's opposite vertex lies on a consistent side
        # of the other face's plane. Winding consistency is implied by checking
        # both signs globally rather than assuming inward/outward normals.
        # Local convexity only composes on one component: a soup of several
        # bodies (room + furniture) is never treated as convex.
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components

        f = self.faces
        ii = np.concatenate([f[:, 0], f[:, 1], f[:, 2]])
        jj = np.concatenate([f[:, 1], f[:, 2], f[:, 0]])
        adj = coo_matrix(
            (np.ones(len(ii)), (ii, jj)), shape=(len(self.vertices),) * 2
        )
        n_comp, labels = connected_components(adj, directed=False)
        # Count components among REFERENCED vertices only: a stray unreferenced
        # vertex (common in scan exports) is a singleton component and would
        # otherwise misclassify every convex room as nonconvex forever.
        referenced = np.zeros(len(self.vertices), dtype=bool)
        referenced[f.ravel()] = True
        if len(np.unique(labels[referenced])) > 1:
            self._is_convex = False
            return False
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges_sorted = np.sort(edges, axis=1)
        opposite = np.concatenate([f[:, 2], f[:, 0], f[:, 1]])
        face_of = np.tile(np.arange(len(f)), 3)
        uniq, inverse = np.unique(edges_sorted, axis=0, return_inverse=True)
        order = np.argsort(inverse, kind="stable")
        # watertight => exactly two halfedges per unique edge
        fa, fb = face_of[order[0::2]], face_of[order[1::2]]
        ov_a, ov_b = opposite[order[0::2]], opposite[order[1::2]]
        tol = 1e-6 * float(np.max(np.ptp(self.vertices, axis=0)) + 1e-12)
        normals = self.face_normals
        anchors = self.vertices[f[:, 0]]
        # signed distance of face B's opposite vertex to face A's plane (and
        # vice versa); convex iff all share one sign across the whole mesh
        s_ab = np.einsum("ek,ek->e", normals[fa], self.vertices[ov_b] - anchors[fa])
        s_ba = np.einsum("ek,ek->e", normals[fb], self.vertices[ov_a] - anchors[fb])
        s = np.concatenate([s_ab, s_ba])
        self._is_convex = bool(np.all(s >= -tol) or np.all(s <= tol))
        return self._is_convex

    def broken_faces(self) -> np.ndarray:
        """Indices of faces containing a boundary (non-manifold) edge."""
        f = self.faces
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges_sorted = np.sort(edges, axis=1)
        uniq, inverse, counts = np.unique(
            edges_sorted, axis=0, return_inverse=True, return_counts=True
        )
        bad_edge = counts[inverse] != 2  # per concatenated-edge flag
        bad_face = bad_edge.reshape(3, len(f)).any(axis=0)
        return np.flatnonzero(bad_face)

    # ------------------------------------------------------------------
    # Repair
    # ------------------------------------------------------------------

    def remove_degenerate_faces(self) -> int:
        """Drop zero-area faces in place; returns number removed."""
        keep = self.face_areas > 1e-12
        removed = int((~keep).sum())
        if removed:
            self.faces = self.faces[keep]
            self._tri_cache = None
        return removed

    def fix_winding(self) -> None:
        """Orient faces consistently by propagating winding across shared edges."""
        f = self.faces
        n_faces = len(f)
        if n_faces == 0:
            return
        # Build edge -> face adjacency
        edge_map: dict = {}
        for fi in range(n_faces):
            for a, b in ((f[fi, 0], f[fi, 1]), (f[fi, 1], f[fi, 2]), (f[fi, 2], f[fi, 0])):
                edge_map.setdefault((min(a, b), max(a, b)), []).append((fi, a, b))

        visited = np.zeros(n_faces, dtype=bool)
        flip = np.zeros(n_faces, dtype=bool)
        for seed in range(n_faces):
            if visited[seed]:
                continue
            stack = [seed]
            visited[seed] = True
            while stack:
                fi = stack.pop()
                fa = f[fi]
                if flip[fi]:
                    fa = fa[::-1]
                directed = {(fa[0], fa[1]), (fa[1], fa[2]), (fa[2], fa[0])}
                for a, b in ((fa[0], fa[1]), (fa[1], fa[2]), (fa[2], fa[0])):
                    for fj, ja, jb in edge_map.get((min(a, b), max(a, b)), []):
                        if fj == fi or visited[fj]:
                            continue
                        fb = f[fj]
                        jdir = (ja, jb)
                        # Coherent winding: shared edge traversed in opposite
                        # directions by its two faces.
                        if jdir in directed:
                            flip[fj] = True
                        visited[fj] = True
                        stack.append(fj)
        if flip.any():
            self.faces[flip] = self.faces[flip][:, ::-1]
            self._tri_cache = None

    def repair(self) -> None:
        """Best-effort in-place repair: degenerate removal + winding fix."""
        self.remove_degenerate_faces()
        self.fix_winding()
        logger.info(f"Broken faces after repair: {len(self.broken_faces())}")

    # ------------------------------------------------------------------
    # Sampling helpers
    # ------------------------------------------------------------------

    def sample_surface(self, n: int, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Sample `n` points uniformly from the mesh surface (area-weighted)."""
        rand = rng if rng is not None else np.random.default_rng()
        areas = self.face_areas
        probs = areas / areas.sum()
        face_idx = rand.choice(len(self.faces), size=n, p=probs)
        tri = self.triangles[face_idx]
        u = rand.uniform(size=(n, 1))
        v = rand.uniform(size=(n, 1))
        over = (u + v) > 1
        u = np.where(over, 1 - u, u)
        v = np.where(over, 1 - v, v)
        return tri[:, 0] + u * (tri[:, 1] - tri[:, 0]) + v * (tri[:, 2] - tri[:, 0])

    def scaled(self, factor: float) -> "TriMesh":
        """Return a copy with vertices scaled by `factor`."""
        return TriMesh(self.vertices * factor, self.faces.copy(), dict(self.metadata))

    def subdivided(self, levels: int = 1) -> "TriMesh":
        """Midpoint-subdivide each face into 4, `levels` times (watertight in,
        watertight out: midpoints are deduplicated per shared edge)."""
        vertices = self.vertices.copy()
        faces = self.faces.copy()
        for _ in range(levels):
            n_v = len(vertices)
            # Unique undirected edges + midpoint index per edge
            e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
            e_sorted = np.sort(e, axis=1)
            uniq, inverse = np.unique(e_sorted, axis=0, return_inverse=True)
            midpoints = 0.5 * (vertices[uniq[:, 0]] + vertices[uniq[:, 1]])
            vertices = np.concatenate([vertices, midpoints])
            f = len(faces)
            m01 = n_v + inverse[:f]
            m12 = n_v + inverse[f : 2 * f]
            m20 = n_v + inverse[2 * f :]
            a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
            faces = np.concatenate(
                [
                    np.stack([a, m01, m20], 1),
                    np.stack([m01, b, m12], 1),
                    np.stack([m20, m12, c], 1),
                    np.stack([m01, m12, m20], 1),
                ]
            )
        return TriMesh(vertices, faces.astype(np.int32), dict(self.metadata))

    def simplified(
        self,
        voxel: Optional[float] = None,
        target_faces: Optional[int] = None,
    ) -> "TriMesh":
        """Vertex-clustering decimation for acoustic ray tracing.

        Snaps vertices to a `voxel`-sized grid, merges each cluster to its mean
        position, drops collapsed faces and deduplicates identical ones. With
        `target_faces` instead, the voxel size is found by bisection so the
        result lands at or under the budget.

        This is the TPU-side analog of the reference rlr engine's
        `mesh_simplification` config field (reference
        tests/test_worldstate_rlr.py:810-835): sound at audio wavelengths
        (>= 4 cm at 8 kHz) does not resolve centimetre surface detail — that
        regime belongs to the scattering coefficient — so the energy tail can
        trace against a coarsened surface. Clustering preserves topology (shared
        edges stay shared, so a watertight enclosure stays closed) and biases no
        direction; the DIRECT path must still be traced against the full mesh
        (WorldStateRLR passes it separately).
        """
        if (voxel is None) == (target_faces is None):
            raise ValueError("pass exactly one of voxel= or target_faces=")
        # Instance-level memo: dataset generators share one TriMesh across many
        # Scene/WorldState instances; decimating a 10^5-face scan costs ~1 s of
        # host time, so the result is cached per (voxel|target) on this object.
        # (TriMesh vertices are treated as immutable after load; mutating code
        # paths construct new TriMesh objects.)
        memo = getattr(self, "_simplify_memo", None)
        if memo is None:
            memo = self._simplify_memo = {}
        memo_key = ("v", float(voxel)) if voxel is not None else ("t", int(target_faces))
        if memo_key in memo:
            return memo[memo_key]
        if target_faces is not None:
            if len(self.faces) <= target_faces:
                return TriMesh(
                    self.vertices.copy(), self.faces.copy(), dict(self.metadata)
                )
            extent = float(np.max(self.bounds[1] - self.bounds[0]))
            lo, hi = extent / 4096.0, extent / 4.0  # bisect on voxel size
            best = None
            # _cluster (uncached): memoizing ~24 intermediate LODs per room
            # leaked tens of MB per mesh across a dataset run — only the
            # final budget-satisfying mesh is worth keeping.
            for _ in range(24):
                mid = float(np.sqrt(lo * hi))  # geometric bisection
                m = self._cluster(mid)
                if len(m.faces) > target_faces:
                    lo = mid
                else:
                    best = (mid, m)
                    hi = mid
                if hi / lo < 1.02:
                    break
            result = best[1] if best is not None else self._cluster(hi)
            memo[memo_key] = result
            return result

        result = self._cluster(float(voxel))
        memo[memo_key] = result
        return result

    def _cluster(self, voxel: float) -> "TriMesh":
        """Uncached vertex-clustering worker for `simplified` (one voxel size)."""
        v = self.vertices
        origin = v.min(axis=0)
        key = np.floor((v - origin) / float(voxel)).astype(np.int64)
        # Unique cluster per occupied voxel; representative = mean member position
        _, cluster, counts = np.unique(
            key, axis=0, return_inverse=True, return_counts=True
        )
        rep = np.zeros((len(counts), 3), dtype=np.float64)
        np.add.at(rep, cluster, v)
        rep /= counts[:, None]

        f = cluster[self.faces]
        # Drop faces collapsed to fewer than 3 distinct clusters
        ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 2] != f[:, 0])
        f = f[ok]
        if len(f):
            # Deduplicate winding-equivalent copies: canonical cyclic rotation
            # (smallest index first) preserves orientation, so an opposite-wound
            # twin (thin double-sided geometry) is NOT merged away.
            argmin = np.argmin(f, axis=1)
            canon = np.stack(
                [np.take_along_axis(f, (argmin[:, None] + k) % 3, axis=1)[:, 0]
                 for k in range(3)],
                axis=1,
            )
            _, keep = np.unique(canon, axis=0, return_index=True)
            f = f[np.sort(keep)]
        meta = dict(self.metadata)
        meta["simplified_from_faces"] = len(self.faces)
        meta["simplified_voxel"] = float(voxel)
        return TriMesh(rep, f.astype(np.int32), meta)

    def jittered(self, amplitude: float, seed: int = 0) -> "TriMesh":
        """Displace vertices by uniform noise of +-`amplitude` (shared vertices
        move together, so watertightness is preserved) — a cheap stand-in for
        3D-scan surface roughness."""
        rng = np.random.default_rng(seed)
        noise = rng.uniform(-amplitude, amplitude, self.vertices.shape)
        return TriMesh(self.vertices + noise, self.faces.copy(), dict(self.metadata))

    def __repr__(self) -> str:
        return (
            f"TriMesh(V={len(self.vertices)}, F={len(self.faces)}, "
            f"bounds={np.round(self.bounds, 3).tolist()})"
        )


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def _load_obj(path: Path) -> tuple[np.ndarray, np.ndarray]:
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                # OBJ indices are 1-based; NEGATIVE indices are relative to
                # the vertices declared so far (several exporters emit them —
                # int(tok)-1 would silently wrap to the wrong vertex)
                raw = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [r - 1 if r > 0 else len(verts) + r for r in raw]
                # fan-triangulate polygons
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int32)


def _load_ply(path: Path) -> tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii").strip()
            header_lines.append(line)
            if line == "end_header":
                break
        n_verts = n_faces = 0
        fmt = "ascii"
        props = []
        face_types = ("uchar", "int")  # PLY's conventional face list layout
        current = None
        for line in header_lines:
            toks = line.split()
            if not toks:
                continue
            if toks[0] == "format":
                fmt = toks[1]
            elif toks[0] == "element":
                current = toks[1]
                if current == "vertex":
                    n_verts = int(toks[2])
                elif current == "face":
                    n_faces = int(toks[2])
            elif toks[0] == "property" and current == "vertex":
                props.append((toks[-1], toks[1]))
            elif toks[0] == "property" and current == "face" and toks[1] == "list":
                face_types = (toks[2], toks[3])

        if fmt == "ascii":
            verts = []
            for _ in range(n_verts):
                vals = f.readline().split()
                verts.append([float(vals[i]) for i, (nm, _) in enumerate(props) if nm in "xyz"][:3])
            faces = []
            for _ in range(n_faces):
                vals = [int(x) for x in f.readline().split()]
                cnt, idx = vals[0], vals[1:]
                for i in range(1, cnt - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
            return np.asarray(verts), np.asarray(faces, dtype=np.int32)

        if fmt != "binary_little_endian":
            # Decoding big-endian with little-endian dtypes silently produces
            # byte-swapped junk geometry — refuse loudly instead.
            raise ValueError(
                f"Unsupported PLY format '{fmt}' in {path} "
                "(ascii and binary_little_endian are supported)"
            )
        # binary little endian; honour the declared property types
        type_map = {
            "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
            "uint": "<u4", "uint32": "<u4",
        }
        dtype = np.dtype([(nm, type_map[tp]) for nm, tp in props])
        vdata = np.frombuffer(f.read(dtype.itemsize * n_verts), dtype=dtype)
        verts = np.stack([vdata["x"], vdata["y"], vdata["z"]], axis=1).astype(np.float64)
        cnt_dt = np.dtype(type_map[face_types[0]])
        idx_dt = np.dtype(type_map[face_types[1]])
        faces = []
        for _ in range(n_faces):
            cnt = int(np.frombuffer(f.read(cnt_dt.itemsize), dtype=cnt_dt)[0])
            idx = np.frombuffer(f.read(idx_dt.itemsize * cnt), dtype=idx_dt)
            for i in range(1, cnt - 1):
                faces.append([idx[0], idx[i], idx[i + 1]])
        return verts, np.asarray(faces, dtype=np.int32)


def load_mesh(mesh_fpath: Union[str, Path]) -> TriMesh:
    """Load a mesh from disk (glb/gltf/obj/ply) and coerce units to metres.

    Mirrors the semantics of reference worldstate.py:51-71: metadata carries the
    filename/filetype/filepath; a heuristic warns (and rescales) when a mesh looks
    like it is in millimetres.
    """
    mesh_fpath = utils.sanitise_filepath(mesh_fpath)
    suffix = mesh_fpath.suffix.lower()
    if suffix in (".glb", ".gltf"):
        from audiblelight_tpu.io.gltf import load_gltf

        vertices, faces, visuals = load_gltf(mesh_fpath, with_visuals=True)
    elif suffix == ".obj":
        vertices, faces = _load_obj(mesh_fpath)
    elif suffix == ".ply":
        vertices, faces = _load_ply(mesh_fpath)
    else:
        raise ValueError(f"Unsupported mesh format: {suffix}")

    mesh = TriMesh(
        vertices,
        faces,
        metadata=dict(fname=mesh_fpath.stem, ftype=mesh_fpath.suffix, fpath=str(mesh_fpath)),
    )
    if suffix in (".glb", ".gltf"):
        mesh.visuals = visuals

    # Unit coercion heuristic (the reference guesses units from extents for
    # every format via trimesh convert_units(guess=True), worldstate.py:66-71):
    # a building scan larger than 1000 m across is almost certainly
    # millimetres, 100-1000 m likely centimetres. glTF/GLB units are metres BY
    # SPEC, so those formats are exempt from the centimetres rule (a
    # legitimately large >100 m venue must not be silently rescaled 100x); the
    # millimetres rule still applies everywhere because >1000 m scenes do not
    # occur in this domain while mm-exported scans do.
    extent = np.max(mesh.bounds[1] - mesh.bounds[0])
    units_defined = suffix in (".glb", ".gltf")
    factor = 1000.0 if extent > 1000.0 else (
        100.0 if (extent > 100.0 and not units_defined) else 1.0
    )
    if factor != 1.0:
        unit = "millimetres" if factor == 1000.0 else "centimetres"
        logger.warning(
            f"Mesh {mesh_fpath.stem} spans {extent:.0f} units; assuming {unit} "
            f"and converting to {config.MESH_UNITS}"
        )
        mesh.vertices = mesh.vertices / factor
        mesh._tri_cache = None
    return mesh


def box_mesh(
    extents: Union[list, np.ndarray] = (1.0, 1.0, 1.0),
    center: Union[list, np.ndarray] = (0.0, 0.0, 0.0),
    inward_normals: bool = True,
) -> TriMesh:
    """An axis-aligned box (12 triangles). With `inward_normals` the box encloses an
    interior acoustic volume (a shoebox room); otherwise it is a solid."""
    ex = np.asarray(extents, dtype=float) / 2.0
    c = np.asarray(center, dtype=float)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], dtype=float
    )
    vertices = corners * ex + c
    # Outward-wound faces of the unit box (corner indexing: bit2=x, bit1=y, bit0=z)
    faces = np.array(
        [
            [0, 1, 3], [0, 3, 2],  # -x
            [4, 6, 7], [4, 7, 5],  # +x
            [0, 4, 5], [0, 5, 1],  # -y
            [2, 3, 7], [2, 7, 6],  # +y
            [0, 2, 6], [0, 6, 4],  # -z
            [1, 5, 7], [1, 7, 3],  # +z
        ],
        dtype=np.int32,
    )
    if inward_normals:
        faces = faces[:, ::-1]
    return TriMesh(vertices, faces, metadata=dict(fname="box", ftype="generated", fpath="box"))


def scanned_like_room(
    extents=(7.0, 5.0, 3.0),
    center=None,
    n_furniture: int = 8,
    subdivision_levels: int = 5,
    jitter: float = 0.015,
    seed: int = 0,
) -> TriMesh:
    """A dense, noisy, nonconvex interior resembling a 3D-scanned room.

    Stand-in workload for Gibson scans (which are license-gated downloads):
    a box shell plus furniture/partition boxes, midpoint-subdivided and
    vertex-jittered so the tracer faces ~10^5 irregular triangles with real
    interior occlusion — the regime the reference pushes through rlr's C++
    BVH (reference worldstate.py:2148-2181).
    """
    extents = np.asarray(extents, dtype=np.float64)
    if center is None:
        center = extents / 2
    rng = np.random.default_rng(seed)

    parts = [box_mesh(extents=extents, center=center)]
    lo = center - extents / 2
    for _ in range(max(0, int(n_furniture))):
        if rng.uniform() < 0.4:
            length = rng.uniform(0.3, 0.6) * extents[1]
            ext = np.array([rng.uniform(0.1, 0.25), length, extents[2] * 0.95])
            pos = lo + np.array(
                [rng.uniform(0.25, 0.75) * extents[0], length / 2, ext[2] / 2]
            )
        else:
            ext = rng.uniform([0.4, 0.4, 0.4], [1.6, 2.0, 1.3])
            pos = lo + np.array(
                [
                    rng.uniform(0.15, 0.85) * extents[0],
                    rng.uniform(0.15, 0.85) * extents[1],
                    ext[2] / 2,
                ]
            )
        parts.append(box_mesh(extents=ext, center=pos, inward_normals=False))

    vertices = np.concatenate([p.vertices for p in parts])
    faces_list, offset = [], 0
    for p in parts:
        faces_list.append(p.faces + offset)
        offset += len(p.vertices)
    mesh = TriMesh(vertices, np.concatenate(faces_list))
    mesh = mesh.subdivided(subdivision_levels)
    if jitter:
        mesh = mesh.jittered(jitter, seed=seed)
    mesh.metadata.update(fname=f"scanned_like_{seed}", fpath=f"synthetic://scanned_like_{seed}")
    return mesh
