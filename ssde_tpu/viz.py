"""DPT attention visualization (reference util/misc.py:5-63).

``visualize_attention`` renders the input, the depth prediction and the
mean attention maps of transformer layers 3/6/9/12 for the upper-left
and lower-right corner query tokens — the native equivalent of the
reference's matplotlib panel over ``model.pretrained.attention``.
matplotlib is imported lazily so headless training never requires it.
"""

from __future__ import annotations

import numpy as np

from .models.dpt import get_mean_attention_map

_HYBRID_LAYERS = (3, 6, 9, 12)  # reference util/misc.py:18 (dpt_hybrid)


def visualize_attention(image, attention, prediction, grid_hw,
                        save_path=None):
    """Panel of corner-token attention maps.

    Args:
      image: (H, W, 3) float array in [0, 1] (NHWC frame, batch stripped).
      attention: dict {"attn_1".."attn_4"} of (B, heads, N+1, N+1) maps,
        as returned by ``DPTDepthModel(..., capture_attention=True)``.
      prediction: (H, W) depth/disparity map to show alongside.
      grid_hw: (gh, gw) ViT token grid (H // 16, W // 16).
      save_path: write the figure there instead of showing it.
    """
    import matplotlib

    if save_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def corner_map(key, token_index):
        m = np.asarray(get_mean_attention_map(attention[key], token_index,
                                              grid_hw))[0]
        return m

    plt.figure(figsize=(12, 8))
    plt.subplot(3, 4, 1)
    plt.imshow(np.asarray(image))
    plt.title("Input", fontsize=8)
    plt.axis("off")
    plt.subplot(3, 4, 2)
    plt.imshow(np.asarray(prediction))
    plt.set_cmap("inferno")
    plt.title("Prediction", fontsize=8)
    plt.axis("off")

    for row, (corner, token) in enumerate((("Upper left corner", 1),
                                           ("Lower right corner", -1))):
        for i, key in enumerate(("attn_1", "attn_2", "attn_3", "attn_4")):
            ax = plt.subplot(3, 4, 5 + 4 * row + i)
            ax.imshow(corner_map(key, token))
            if row == 0:
                ax.set_title(f"Layer {_HYBRID_LAYERS[i]}", fontsize=8)
            if i == 0:
                ax.set_ylabel(corner, fontsize=8)
            ax.set_xticks([])
            ax.set_yticks([])

    plt.tight_layout()
    if save_path is not None:
        plt.savefig(save_path, dpi=120)
        plt.close()
    else:
        plt.show()
