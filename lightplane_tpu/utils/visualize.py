"""Interactive plotly visualization of ray batches.

Counterpart of reference ``lightplane/visualize.py:26-288``: one 3D subplot
per ``grid_idx`` showing the [-1, 1] NDC cube, ray segments from near to far,
near/far endpoints, and optional per-ray color markers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..ops.rays import Rays


def _cube_edges():
    """Vertex pairs of the [-1, 1]^3 cube wireframe."""
    corners = np.array(
        [
            [x, y, z]
            for x in (-1.0, 1.0)
            for y in (-1.0, 1.0)
            for z in (-1.0, 1.0)
        ]
    )
    edges = []
    for i in range(8):
        for j in range(i + 1, 8):
            if np.sum(np.abs(corners[i] - corners[j])) == 2.0:
                edges.append((corners[i], corners[j]))
    return edges


def _segments_trace(go, starts, ends, name, color=None, width=2.0):
    """A single plotly trace drawing many disconnected segments."""
    n = starts.shape[0]
    xs = np.full((n, 3), np.nan)
    ys = np.full((n, 3), np.nan)
    zs = np.full((n, 3), np.nan)
    xs[:, 0], xs[:, 1] = starts[:, 0], ends[:, 0]
    ys[:, 0], ys[:, 1] = starts[:, 1], ends[:, 1]
    zs[:, 0], zs[:, 1] = starts[:, 2], ends[:, 2]
    return go.Scatter3d(
        x=xs.ravel(),
        y=ys.ravel(),
        z=zs.ravel(),
        mode="lines",
        name=name,
        line=dict(width=width, color=color),
    )


def visualize_rays_plotly(
    rays: Rays,
    pixel_colors: Optional[np.ndarray] = None,
    max_display_rays: int = 512,
    ray_line_width: float = 1.5,
    marker_size: float = 2.0,
    title: str = "rays",
):
    """Build a plotly figure visualizing rays, one subplot per grid index.

    Args:
        rays: the ray batch to display.
        pixel_colors: optional ``[B, 3]`` RGB in [0, 1] drawn at ray far
            points.
        max_display_rays: subsample cap per scene.

    Returns:
        a ``plotly.graph_objects.Figure``.
    """
    import plotly.graph_objects as go
    from plotly.subplots import make_subplots

    dirs = np.asarray(rays.directions)
    origins = np.asarray(rays.origins)
    near = np.asarray(rays.near)
    far = np.asarray(rays.far)
    grid_idx = np.asarray(rays.grid_idx)
    uniq = np.unique(grid_idx)

    fig = make_subplots(
        rows=1,
        cols=len(uniq),
        specs=[[{"type": "scene"}] * len(uniq)],
        subplot_titles=[f"grid_idx={int(g)}" for g in uniq],
    )

    for col, g in enumerate(uniq, start=1):
        sel = np.where(grid_idx == g)[0]
        if len(sel) > max_display_rays:
            sel = sel[
                np.linspace(0, len(sel) - 1, max_display_rays).astype(int)
            ]
        o = origins[sel]
        d = dirs[sel]
        p_near = o + near[sel][:, None] * d
        p_far = o + far[sel][:, None] * d

        for e0, e1 in _cube_edges():
            fig.add_trace(
                go.Scatter3d(
                    x=[e0[0], e1[0]],
                    y=[e0[1], e1[1]],
                    z=[e0[2], e1[2]],
                    mode="lines",
                    showlegend=False,
                    line=dict(color="gray", width=1),
                ),
                row=1,
                col=col,
            )
        fig.add_trace(
            _segments_trace(
                go, p_near, p_far, f"rays_{int(g)}", width=ray_line_width
            ),
            row=1,
            col=col,
        )
        marker_kwargs = dict(size=marker_size)
        if pixel_colors is not None:
            cols255 = (np.asarray(pixel_colors)[sel] * 255).astype(int)
            marker_kwargs["color"] = [
                f"rgb({r},{gg},{b})" for r, gg, b in cols255
            ]
        fig.add_trace(
            go.Scatter3d(
                x=p_far[:, 0],
                y=p_far[:, 1],
                z=p_far[:, 2],
                mode="markers",
                name=f"far_{int(g)}",
                marker=marker_kwargs,
            ),
            row=1,
            col=col,
        )
    fig.update_layout(title=title)
    return fig
