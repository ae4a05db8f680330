"""Pixel-level explanation evaluation on Camelyon16 — the reference's
ExplainGraph (/root/reference/evaluator/explain_graphs.py:24-184).

Per tumor slide: run the configured explainer -> per-patch importance mask;
map patch tile filenames (`{col}_{row}.jpeg`) to level-k pixel coordinates;
label each patch by point-in-polygon against the pathologist annotation XML;
per-slide ROC-AUC of mask vs labels; paint a Wistia heatmap + tumor polygon
overlay onto the slide thumbnail.

Library substitutions (documented): shapely's Polygon.contains becomes a
vectorised NumPy even-odd ray cast; openslide is optional (PIL thumbnail
fallback for plain-image slides).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Sequence, Tuple
from xml.dom import minidom

import numpy as np

from ..config import parse_gnn_model
from ..data.datasets import C16EvalDataset
from ..graph import TypedGraph, to_homogeneous
from ..train.checkpoint import CheckpointManager
from ..train.metrics import binary_auc_from_scores


def parse_annotation_xml(xml_path) -> List[np.ndarray]:
    """Tumor polygons from a Camelyon16 annotation XML
    (explain_graphs.py:87-101): list of [K, 2] float arrays."""
    polygons = minidom.parse(str(xml_path)).getElementsByTagName("Coordinates")
    out = []
    for p in polygons:
        coords = []
        for c in p.childNodes:
            if c.attributes:
                coords.append(
                    (float(c.attributes["X"].value), float(c.attributes["Y"].value))
                )
        if coords:
            out.append(np.asarray(coords, np.float64))
    return out


def points_in_polygon(points: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorised even-odd ray cast: [P, 2] points vs [K, 2] polygon ->
    bool [P] (shapely Polygon.contains replacement)."""
    x, y = points[:, 0:1], points[:, 1:2]  # [P, 1]
    x1, y1 = poly[:, 0][None, :], poly[:, 1][None, :]  # [1, K]
    x2, y2 = np.roll(poly[:, 0], -1)[None, :], np.roll(poly[:, 1], -1)[None, :]
    crosses = ((y1 > y) != (y2 > y)) & (
        x < (x2 - x1) * (y - y1) / np.where(y2 - y1 == 0, 1e-30, y2 - y1) + x1
    )
    return crosses.sum(axis=1) % 2 == 1


class ExplainGraph:
    def __init__(self, config: Dict):
        self.config = config
        self.config_data = config["datasets"]
        self.config_gnn = config["GNN"]
        self.config_eval = config["eval"]
        self.name = self.config_data["dataset"]
        self.patches_path = self.config_data["patches_path"]
        self.wsi_path = self.config_data["wsi_path"]
        self.explain_path = self.config_eval["explain_path"]
        self.annot_path = self.config_eval["annotation_path"]
        Path(self.explain_path).mkdir(parents=True, exist_ok=True)

        self.eval_data = C16EvalDataset(
            self.config_data["eval_path"], self.annot_path,
            self.config_data.get(
                "reference_csv", "./data/camelyon16/testing/reference.csv"
            ),
        )

        import jax

        self.checkpoint_manager = CheckpointManager(config["checkpoint"]["path"])
        self.model, self.is_hetero = parse_gnn_model(self.config_gnn)
        # the reference loads its trained weights loudly
        # (explain_graphs.py:42-43) — explaining a randomly-initialised
        # model would print plausible-looking AUCs, so a missing
        # checkpoint raises here
        self.variables = self.checkpoint_manager.restore_variables()

        self.n_hops = self.config_gnn["num_layers"] - 1
        self.level = self.config_eval["level"]
        self.base_patch_size = self.config_eval["patch_size"]
        self.patch_size = self.config_eval["patch_size"] // (2 ** (self.level - 1))
        self.explainer_name = self.config_eval["explainer_name"]

    # ------------------------------------------------------------------ #
    def _model_fn(self, g: TypedGraph, feat_override=None):
        if feat_override is not None:
            g = g.replace(feat=feat_override)
        gg = g if self.is_hetero else to_homogeneous(g)
        return self.model.apply(self.variables, gg, train=False)

    def get_magnified_image(self, name: str):
        """Slide thumbnail at the configured level (explain_graphs.py:55-68);
        openslide for .svs/.tif pyramids, PIL otherwise."""
        suffix = ".svs" if self.name == "COAD" else ".tif"
        path = self.wsi_path + name + suffix
        try:
            from openslide import OpenSlide

            wsi = OpenSlide(path)
            dim = wsi.level_dimensions[self.level]
            return np.asarray(wsi.get_thumbnail(dim).convert("RGB")), wsi.dimensions
        except Exception:
            # openslide absent OR the slide isn't an openslide-readable
            # pyramid (plain .png/.jpeg exports) — the PIL path handles
            # both; only catching ImportError made it unreachable with
            # openslide installed
            from PIL import Image

            for ext in (suffix, ".png", ".jpeg", ".jpg"):
                p = self.wsi_path + name + ext
                if os.path.exists(p):
                    img = Image.open(p).convert("RGB")
                    w, h = img.size
                    f = 2 ** self.level
                    return np.asarray(img.resize((w // f, h // f))), (w, h)
            raise FileNotFoundError(path)

    def get_patch_coords(self, name: str) -> List[Tuple[int, int]]:
        """Tile filename (col_row) -> level-`level` pixel coords
        (explain_graphs.py:70-79; dz._z_from_t(t) == tile_size * t)."""
        mag_factor = 2 ** (self.level - 1)
        coords_dir = Path(self.patches_path) / name
        out = []
        # enumerate EXACTLY like the graph constructor's patch list
        # (pipeline.patches.list_patches: sorted files only) — a stray
        # subdirectory or dotfile would otherwise shift every coordinate
        # against the node order the graph was built with
        from ..pipeline.patches import list_patches

        for p in list_patches(coords_dir):
            x, y = p.name.rsplit(".", 1)[0].split("_")[:2]
            out.append(
                (self.base_patch_size * int(x) // mag_factor,
                 self.base_patch_size * int(y) // mag_factor)
            )
        return out

    def get_ground_truths(self, xml_path, patches_coords):
        """Point-in-polygon patch labels (explain_graphs.py:81-119): patch
        centre at level 0 = coord * 2^level + base_patch_size."""
        polygons = parse_annotation_xml(xml_path)
        mag_factor = 2 ** self.level
        s = self.base_patch_size * 2 // 2
        centers = np.asarray(
            [(cx * mag_factor + s, cy * mag_factor + s) for cx, cy in patches_coords],
            np.float64,
        )
        labels = np.zeros(len(centers), np.int32)
        for poly in polygons:
            labels |= points_in_polygon(centers, poly).astype(np.int32)
        return labels.tolist(), polygons

    def visualize(self, node_mask, wsi_name, patches_coords, poly_coords, img):
        """Wistia-colormapped patch rectangles + tumor polygons
        (explain_graphs.py:130-149)."""
        import cv2
        import matplotlib
        from matplotlib import cm
        from PIL import Image

        img = np.array(img, copy=True)  # cv2 needs a writable buffer
        Image.fromarray(img).save(os.path.join(self.explain_path, wsi_name + ".png"))

        norm = matplotlib.colors.Normalize(vmin=0, vmax=1)
        cmap = matplotlib.colormaps["Wistia"]
        colours = cmap(norm(np.asarray(node_mask)))[:, :3]

        s = self.patch_size
        for (bbox, cl) in zip(patches_coords, colours):
            cl = [float(c) * 255 for c in cl]
            img = cv2.rectangle(
                img, (bbox[0] + s, bbox[1]), (bbox[0], bbox[1] + s), cl, cv2.FILLED
            )
        for coords in poly_coords:
            mag_fac = 2 ** self.level
            pts = (coords.reshape((-1, 1, 2)) / mag_fac).astype(np.int32)
            img = cv2.polylines(img, [pts], False, (255, 0, 0), thickness=4)
        Image.fromarray(img).save(os.path.join(self.explain_path, wsi_name + ".jpeg"))

    # ------------------------------------------------------------------ #
    def explain_one(self, graph: TypedGraph, label: int) -> np.ndarray:
        from .gem import GemExplainer, HetGemExplainer
        from .gnn_explainer import GNNExplainer

        if self.explainer_name == "GNNExplainer":
            explainer = GNNExplainer(graph, self._model_fn, num_hops=self.n_hops)
            _, node_mask = explainer.explain_node(None)
            return node_mask
        if self.explainer_name == "GemExplainer":
            # pass the BOUND method, not a fresh lambda: the GEM explainers
            # key their jitted leave-one-out programs on the callable
            # (gem.py lru_cache), so a per-slide lambda would recompile the
            # chunk program for every slide of the cohort
            if graph.is_homogeneous:
                return GemExplainer(graph, self._model_fn, label).explain_node()
            return HetGemExplainer(graph, self._model_fn, label).flat_scores()
        raise NotImplementedError("This Explainer is not implemented")

    def eval(self) -> List[float]:
        auc_list = []
        for idx in range(len(self.eval_data)):
            path = self.eval_data.graph_paths[idx]
            graph, xml_path, label = self.eval_data[idx]
            wsi_name = Path(path).parts[-1][:-4]

            node_mask = self.explain_one(graph, label)

            img, _ = self.get_magnified_image(wsi_name)
            patches_coords = self.get_patch_coords(wsi_name)
            labels, poly_coords = self.get_ground_truths(xml_path, patches_coords)

            aucroc = binary_auc_from_scores(np.asarray(labels), np.asarray(node_mask))
            auc_list.append(aucroc)
            self.visualize(node_mask, wsi_name, patches_coords, poly_coords, img)
            print(f"Mean AUCROC: {np.nanmean(auc_list)}")
        return auc_list
