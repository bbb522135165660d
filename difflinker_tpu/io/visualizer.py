"""Molecule / trajectory visualisation (matplotlib + imageio, host-side).

Port of src/visualizer.py:62-227: 3D molecule plots with geometric bond
drawing and denoising-chain GIFs, with PCA alignment of frames to the final
molecule. Bond decisions reuse chem/bonds.py (same tables as the reference's
get_bond_order calls at src/visualizer.py:97).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from difflinker_tpu.chem.bonds import bond_order_matrix
from difflinker_tpu.io.xyz import load_molecule_xyz, load_xyz_files

COLORS = ['C0', 'C1', 'C2', 'C3', 'C4', 'C5', 'C6', 'C7', 'C8']
RADII = [0.77] * 9


def plot_molecule(ax, positions, atom_types, alpha, spheres_3d, hex_bg_color,
                  fragment_mask=None):
    positions = np.asarray(positions)
    atom_types = np.asarray(atom_types)
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    colors = np.array(COLORS)[atom_types]
    radii = np.array(RADII)[atom_types]
    areas = 1500 * radii ** 2

    orders = bond_order_matrix(positions, atom_types)
    ii, jj = np.nonzero(np.triu(orders))
    for i, j in zip(ii, jj):
        lw_factor = 1.5 if orders[i, j] == 4 else 1.0
        ax.plot([x[i], x[j]], [y[i], y[j]], [z[i], z[j]],
                linewidth=4 * lw_factor, c=hex_bg_color, alpha=alpha)

    if spheres_3d:
        if fragment_mask is None:
            fragment_mask = np.ones(len(x))
        u = np.linspace(0, 2 * np.pi, 40)
        v = np.linspace(0, np.pi, 40)
        for xi, yi, zi, r, c, f in zip(x, y, z, radii, colors, fragment_mask):
            a = 1.0 if f == 1 else alpha
            xs = 0.5 * r * np.outer(np.cos(u), np.sin(v))
            ys = 0.5 * r * np.outer(np.sin(u), np.sin(v))
            zs = 0.5 * r * np.outer(np.ones_like(u), np.cos(v))
            ax.plot_surface(xi + xs, yi + ys, zi + zs, rstride=2, cstride=2,
                            color=c, alpha=a)
    else:
        ax.scatter(x, y, z, s=areas, alpha=0.9 * alpha, c=colors)


def plot_data3d(positions, atom_types, camera_elev=0, camera_azim=0,
                save_path: Optional[str] = None, spheres_3d=False, bg='black',
                alpha=1.0, fragment_mask=None):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    hex_bg_color = '#FFFFFF' if bg == 'black' else '#000000'
    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(projection='3d')
    ax.set_aspect('auto')
    ax.view_init(elev=camera_elev, azim=camera_azim)
    ax.set_facecolor((0, 0, 0) if bg == 'black' else (1, 1, 1))
    for pane in (ax.xaxis.pane, ax.yaxis.pane, ax.zaxis.pane):
        pane.set_alpha(0)
    ax.set_axis_off()

    plot_molecule(ax, positions, atom_types, alpha, spheres_3d, hex_bg_color,
                  fragment_mask)

    max_value = float(np.abs(np.asarray(positions)).max())
    lim = min(40.0, max(max_value / 1.5 + 0.3, 3.2))
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-lim, lim)
    dpi = 120 if spheres_3d else 50
    if save_path is not None:
        plt.savefig(save_path, bbox_inches='tight', pad_inches=0.0, dpi=dpi)
    plt.close(fig)
    return save_path


def visualize_chain(path: str, spheres_3d=False, bg='black', alpha=1.0,
                    is_geom=False, fragment_mask=None) -> str:
    """Render every `<name>_.xyz` frame under `path` to png and assemble a
    GIF, PCA-aligned to the final frame (src/visualizer.py:186-224)."""
    import imageio.v2 as imageio
    from sklearn.decomposition import PCA

    files = load_xyz_files(path)
    positions, _, _ = load_molecule_xyz(files[-1], is_geom=is_geom)
    pca = PCA(n_components=3)
    pca.fit(positions)

    save_paths = []
    for file in files:
        positions, one_hot, _ = load_molecule_xyz(file, is_geom=is_geom)
        atom_types = one_hot.argmax(-1)
        fn = file[:-4] + '.png'
        plot_data3d(pca.transform(positions), atom_types, save_path=fn,
                    spheres_3d=spheres_3d, alpha=alpha, bg=bg,
                    camera_elev=90, camera_azim=90,
                    fragment_mask=fragment_mask)
        save_paths.append(fn)

    gif_path = os.path.join(os.path.dirname(save_paths[0]), 'output.gif')
    imageio.mimsave(gif_path, [imageio.imread(fn) for fn in save_paths],
                    subrectangles=True)
    return gif_path
