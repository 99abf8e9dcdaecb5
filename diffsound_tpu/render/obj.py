"""Wavefront OBJ load/save with MTL support.

Counterpart of /root/reference/src/dmtet/render/obj.py:29-179.  Host-side
numpy parsing; returns a render `Mesh` (positions, texcoords, normals
with separate index buffers) carrying its material dict.
"""

from __future__ import annotations

import os

import numpy as np

from .material import default_material, load_mtl, save_mtl
from .mesh import Mesh, auto_normals, compute_tangents


def load_obj(fn: str, clear_ks: bool = True, mtl_override=None):
    base = os.path.dirname(fn)
    verts, texcoords, normals = [], [], []
    faces, tfaces, nfaces = [], [], []
    all_materials = []
    used_mat = 0
    mat_ids = []

    for line in open(fn):
        split = line.split()
        if not split:
            continue
        prefix = split[0]
        if prefix == "mtllib" and mtl_override is None:
            mtl_path = os.path.join(base, split[1])
            if os.path.exists(mtl_path):
                all_materials += load_mtl(mtl_path, clear_ks)
        elif prefix == "usemtl":
            for i, m in enumerate(all_materials):
                if m["name"] == split[1]:
                    used_mat = i
        elif prefix == "v":
            verts.append([float(x) for x in split[1:4]])
        elif prefix == "vt":
            val = [float(x) for x in split[1:3]]
            texcoords.append([val[0], 1.0 - val[1]])
        elif prefix == "vn":
            normals.append([float(x) for x in split[1:4]])
        elif prefix == "f":
            vs = split[1:]
            nv = len(vs)
            def parse(tok):
                parts = tok.split("/")
                vi = int(parts[0]) - 1
                ti = int(parts[1]) - 1 if len(parts) > 1 and parts[1] else -1
                ni = int(parts[2]) - 1 if len(parts) > 2 and parts[2] else -1
                return vi, ti, ni
            v0, t0, n0 = parse(vs[0])
            for i in range(nv - 2):  # fan triangulation
                v1, t1, n1 = parse(vs[i + 1])
                v2, t2, n2 = parse(vs[i + 2])
                faces.append([v0, v1, v2])
                tfaces.append([t0, t1, t2])
                nfaces.append([n0, n1, n2])
                mat_ids.append(used_mat)

    material = (
        mtl_override
        if mtl_override is not None
        else (all_materials[0] if all_materials else default_material())
    )

    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    m = Mesh(v_pos=verts, t_pos_idx=faces, material=material)
    if texcoords:
        m = m.with_(
            v_tex=np.asarray(texcoords, np.float32),
            t_tex_idx=np.asarray(tfaces, np.int32),
        )
    if normals:
        m = m.with_(
            v_nrm=np.asarray(normals, np.float32),
            t_nrm_idx=np.asarray(nfaces, np.int32),
        )
    else:
        m = auto_normals(m)
    if m.v_tex is not None:
        m = compute_tangents(m)
    return m


def write_obj(folder: str, mesh: Mesh, name: str = "mesh.obj", save_material: bool = True,
              material_params=None):
    os.makedirs(folder, exist_ok=True)
    obj_path = os.path.join(folder, name)
    with open(obj_path, "w") as f:
        f.write("mtllib mesh.mtl\ng default\n")
        v = np.asarray(mesh.v_pos)
        for p in v:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        if mesh.v_tex is not None:
            for t in np.asarray(mesh.v_tex):
                f.write(f"vt {t[0]:.6f} {1.0 - t[1]:.6f}\n")
        if mesh.v_nrm is not None:
            for n in np.asarray(mesh.v_nrm):
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        f.write("usemtl defaultMat\n")
        fp = np.asarray(mesh.t_pos_idx) + 1
        ft = np.asarray(mesh.t_tex_idx) + 1 if mesh.t_tex_idx is not None else fp
        fnr = np.asarray(mesh.t_nrm_idx) + 1 if mesh.t_nrm_idx is not None else fp
        has_t = mesh.v_tex is not None
        has_n = mesh.v_nrm is not None
        for i in range(fp.shape[0]):
            toks = []
            for k in range(3):
                tok = str(fp[i, k])
                tok += "/" + (str(ft[i, k]) if has_t else "")
                tok += "/" + (str(fnr[i, k]) if has_n else "")
                toks.append(tok)
            f.write("f " + " ".join(toks) + "\n")
    if save_material and mesh.material is not None:
        save_mtl(os.path.join(folder, "mesh.mtl"), mesh.material, material_params)
    return obj_path
