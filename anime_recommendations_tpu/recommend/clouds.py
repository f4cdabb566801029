"""Word-cloud rendering for genre/source preference profiles.

The reference renders WordCloud PNGs (user_prefs.py:144-189) with the
``wordcloud`` package. That package is not in this environment, so the
renderer prefers it when importable and otherwise falls back to a pure
matplotlib frequency layout (words scaled by count on a grid) producing
the same artifact: a PNG whose prominent words are the user's favorite
genres/sources.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

try:  # pragma: no cover - optional dependency
    from wordcloud import WordCloud  # type: ignore

    _HAVE_WORDCLOUD = True
except ImportError:  # pragma: no cover
    _HAVE_WORDCLOUD = False


def render_cloud(
    frequencies: dict[str, int],
    path: str | Path,
    width: int = 600,
    height: int = 350,
    background: str = "white",
    colormap: str = "spring",
) -> str:
    """Render a frequency cloud PNG; returns the path written."""
    path = str(path)
    if not frequencies:
        frequencies = {"none": 1}
    if _HAVE_WORDCLOUD:  # pragma: no cover
        cloud = WordCloud(
            width=width,
            height=height,
            prefer_horizontal=0.85,
            background_color=background,
            contour_width=0.05,
            colormap=colormap,
        ).generate_from_frequencies(frequencies)
        cloud.to_file(path)
        return path
    return _matplotlib_cloud(frequencies, path, width, height, background, colormap)


def _matplotlib_cloud(
    frequencies: dict[str, int],
    path: str,
    width: int,
    height: int,
    background: str,
    colormap: str,
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    items = sorted(frequencies.items(), key=lambda kv: -kv[1])[:40]
    counts = np.asarray([c for _, c in items], dtype=np.float64)
    sizes = 10 + 28 * (counts / counts.max()) ** 0.5
    cmap = plt.get_cmap(colormap)
    rng = np.random.default_rng(0)

    fig = plt.figure(figsize=(width / 100, height / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_facecolor(background)
    fig.patch.set_facecolor(background)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.axis("off")
    cols = max(int(np.ceil(np.sqrt(len(items)))), 1)
    for i, (word, _) in enumerate(items):
        x = (i % cols + 0.5) / cols + rng.uniform(-0.04, 0.04)
        y = 1.0 - (i // cols + 0.5) / cols + rng.uniform(-0.03, 0.03)
        ax.text(
            float(np.clip(x, 0.02, 0.98)),
            float(np.clip(y, 0.04, 0.96)),
            word,
            fontsize=float(sizes[i]),
            color=cmap(rng.random()),
            ha="center",
            va="center",
            rotation=0 if rng.random() < 0.85 else 90,
        )
    fig.savefig(path)
    plt.close(fig)
    return path


def genre_cloud(frequencies: dict[str, int], user_id: int,
                out_dir: str | Path = ".", width: int = 600, height: int = 350,
                fn: str = "favorite_genres.png") -> str:
    """User_ID_<id>_favorite_genres.png (user_prefs.py:144-165)."""
    path = Path(out_dir) / f"User_ID_{user_id}_{fn}"
    return render_cloud(frequencies, path, width, height, "white", "spring")


def source_cloud(frequencies: dict[str, int], user_id: int,
                 out_dir: str | Path = ".", width: int = 600, height: int = 350,
                 fn: str = "favorite_source_material.png") -> str:
    """User_ID_<id>_favorite_source_material.png (user_prefs.py:168-189)."""
    path = Path(out_dir) / f"User_ID_{user_id}_{fn}"
    return render_cloud(frequencies, path, width, height, "gray", "autumn")
