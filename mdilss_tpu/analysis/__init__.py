"""Analysis workflows: the reference notebooks as library functions.

  tsne     — Plot_Tsne_Notebook.ipynb: latent-space t-SNE of encoder /
             penultimate features, before/after an incremental step.
  predict  — the notebooks' "save output coloured maps for analysis"
             (Plot_Tsne_Notebook cell 0): colorized prediction PNGs.
"""
from .names import BDD_NAMES, CITY_NAMES, IDD_L3_NAMES, UNION_NAMES
from .predict import save_predictions
from .tsne import extract_features, run_tsne, sample_pixels, tsne_embed

__all__ = [
    "BDD_NAMES", "CITY_NAMES", "IDD_L3_NAMES", "UNION_NAMES",
    "extract_features", "run_tsne", "sample_pixels", "tsne_embed",
    "save_predictions",
]
