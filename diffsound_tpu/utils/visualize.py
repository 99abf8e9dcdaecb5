"""Visualization: spectrogram comparison figures and mesh/mode viewers.

Parity with /root/reference/src/utils/utils.py:164-181 (plot_spec /
plot_signal) and a lightweight replacement for the plotly mesh+mode
viewer (src/utils/visualize.py:18-151): exports an interactive
self-contained HTML file when plotly is available, otherwise a static
matplotlib 3D scatter."""

from __future__ import annotations

import numpy as np


def plot_spec(spec_gt, spec_pred):
    """Side-by-side log-spectrogram figure (gt | prediction)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 5))
    img = np.concatenate([np.asarray(spec_gt), np.asarray(spec_pred)], axis=1)
    plt.imshow(img, origin="lower", aspect="auto", cmap="magma")
    fig.tight_layout(pad=0)
    return fig


def plot_signal(signal):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1)
    ax.plot(np.asarray(signal))
    fig.tight_layout(pad=0)
    return fig


def save_spec_figure(path, spec_gt, spec_pred):
    fig = plot_spec(spec_gt, spec_pred)
    fig.savefig(path)
    import matplotlib.pyplot as plt

    plt.close(fig)


def export_mode_viewer(path: str, vertices, faces, mode_shapes=None,
                       mode_freqs=None):
    """Interactive surface-mesh viewer with per-mode displacement colormaps.

    vertices (V, 3), faces (F, 3); mode_shapes optional (V, 3, M) or
    (3V, M) modal displacements; writes a self-contained HTML file."""
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    try:
        import plotly.graph_objects as go
    except ImportError:
        # fallback: static matplotlib render
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
        ax.plot_trisurf(
            vertices[:, 0], vertices[:, 1], faces, vertices[:, 2],
            cmap="viridis", linewidth=0.1,
        )
        fig.savefig(path.replace(".html", ".png"))
        plt.close(fig)
        return path.replace(".html", ".png")

    if mode_shapes is not None:
        ms = np.asarray(mode_shapes)
        if ms.ndim == 2:
            ms = ms.reshape(len(vertices), 3, -1)
        mags = np.linalg.norm(ms, axis=1)  # (V, M)
    else:
        mags = None

    frames = []
    base = go.Mesh3d(
        x=vertices[:, 0], y=vertices[:, 1], z=vertices[:, 2],
        i=faces[:, 0], j=faces[:, 1], k=faces[:, 2],
        intensity=mags[:, 0] if mags is not None else None,
        colorscale="Viridis",
    )
    fig = go.Figure(data=[base])
    if mags is not None:
        steps = []
        for m in range(mags.shape[1]):
            label = (
                f"mode {m}: {mode_freqs[m]:.1f} Hz" if mode_freqs is not None else f"mode {m}"
            )
            steps.append(
                dict(
                    method="restyle",
                    args=[{"intensity": [mags[:, m]]}],
                    label=label,
                )
            )
        fig.update_layout(sliders=[dict(steps=steps)])
    fig.write_html(path, include_plotlyjs=True)
    return path
