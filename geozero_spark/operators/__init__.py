"""Engine operators (SURVEY.md §2.6): spatial join, kNN, tiling, bbox
selection, dataset bounds — plus the training-data-pipeline operators
(dedup, similarity search, text analysis) over the same tables."""

from . import (bbox_select, boundsagg, dedup, knn, pip_join, similarity,
               textstats, tiling)  # noqa: F401
