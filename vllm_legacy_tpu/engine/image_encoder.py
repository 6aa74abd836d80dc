"""Out-of-band vision encoder for InternLM-XComposer2 serving
(reference: vllm/engine/image_encoder.py — CLIP ViT-L/14-336 + HD
tiling + mlp2x_gelu projector run outside the decode hot loop).

The LM engine never sees pixels: the encoder turns each image into a
``[T, lm_hidden]`` embedding block plus the image-span token mask, and
the serving layer passes them per request as
``multi_modal_data={"prompt_embeds": ..., "embeds_mask": ...}``
(worker/model_runner.py substitutes the rows during prefill). This
keeps the jitted model step free of dynamic tile counts — image count
and resolution only change out-of-band host work.

Layout per image (reference image_encoder.py:226-258): with a
``g x g``-patch tower (g even, 24 for ViT-L/336) and 2x2 patch merge,
each 336px tile yields (g/2)^2 merged tokens of dim 4*C. The sequence
is::

    [ glb tile rows, each row followed by sub_GN ]   (g/2)*(g/2+1)
    [ glb_GN ]                                       1
    [ sub tiles arranged h*(g/2) x w*(g/2), sub_GN per row ]

total (h*w + 1)*(g/2)^2 + 1 + (h + 1)*(g/2) tokens.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.models.clip import CLIPVisionTower

# CLIP pixel normalization (reference image_encoder.py:74-77)
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def hd_transform(img: np.ndarray, tile: int = 336,
                 hd_num: int = 25) -> Tuple[np.ndarray, int, int]:
    """[H, W, 3] float in [0,1] -> ([h*w, 3, tile, tile] sub tiles,
    h, w). Landscape-first scaling into at most ``hd_num`` tiles with
    white padding (reference image_encoder.py HD_transform/padding_336).
    """
    hgt, wdt = img.shape[:2]
    trans = wdt < hgt
    if trans:
        img = img.transpose(1, 0, 2)
        hgt, wdt = wdt, hgt
    ratio = wdt / hgt
    scale = 1
    while scale * math.ceil(scale / ratio) <= hd_num:
        scale += 1
    scale -= 1
    new_w = int(scale * tile)
    new_h = int(new_w / ratio)
    img = np.asarray(
        jax.image.resize(jnp.asarray(img, jnp.float32),
                         (new_h, new_w, 3), "bicubic"))
    tar = int(np.ceil(new_h / tile) * tile)
    top = (tar - new_h) // 2
    img = np.pad(img, ((top, tar - new_h - top), (0, 0), (0, 0)),
                 constant_values=1.0)  # white
    if trans:
        img = img.transpose(1, 0, 2)
    hgt, wdt = img.shape[:2]
    h, w = hgt // tile, wdt // tile
    tiles = img.reshape(h, tile, w, tile, 3)
    tiles = tiles.transpose(0, 2, 4, 1, 3).reshape(h * w, 3, tile, tile)
    return tiles, h, w


class ImageEncoder:
    """CLIP tower + 2x2 merge + GN layout + mlp2x_gelu projector.

    ``encode(image) -> np[T, lm_hidden] f32``. Tower forwards are
    jitted per tile count (a handful of shapes in practice).
    """

    def __init__(self, vision_config: Any, lm_hidden: int = 4096,
                 hd_num: int = 25, select_layer: int = -1):
        self.tower = CLIPVisionTower(vision_config, dtype=jnp.float32)
        self.tile = vision_config.image_size
        self.grid = vision_config.image_size // vision_config.patch_size
        assert self.grid % 2 == 0, "2x2 patch merge needs an even grid"
        self.merged = self.grid // 2
        self.c4 = 4 * self.tower.hidden_size
        self.lm_hidden = lm_hidden
        self.hd_num = hd_num
        # XComposer2 selects the last hidden state (-1); Phi-3-Vision
        # the penultimate (-2, reference models/phi3v.py layer_idx)
        self.select_layer = select_layer
        self.params: Optional[Dict[str, Any]] = None
        self._feat_fns: Dict[int, Any] = {}
        self._proj_fns: Dict[int, Any] = {}

    # -- params ---------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c4, lm = self.c4, self.lm_hidden
        return {
            "vit": self.tower.param_shapes(),
            "vision_proj": {
                "0": {"weight": ((c4, lm), jnp.float32),
                      "bias": ((lm, ), jnp.float32)},
                "2": {"weight": ((lm, lm), jnp.float32),
                      "bias": ((lm, ), jnp.float32)},
            },
            "glb_GN": ((1, c4), jnp.float32),
            "sub_GN": ((1, c4), jnp.float32),
        }

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        c4, lm = self.c4, self.lm_hidden

        def lin(i, o):
            return {"weight": (rng.standard_normal(
                (i, o)) * 0.02).astype(np.float32),
                "bias": np.zeros((o, ), np.float32)}

        self.params = {
            "vit": self.tower.init_dummy_params(rng),
            "vision_proj": {"0": lin(c4, lm), "2": lin(lm, lm)},
            "glb_GN": rng.standard_normal((1, c4)).astype(np.float32),
            "sub_GN": rng.standard_normal((1, c4)).astype(np.float32),
        }
        return self.params

    def load_weights(self, weights) -> Dict[str, Any]:
        """XComposer2 names (``vit.vision_tower.vision_model.*``,
        ``vision_proj.{0,2}.*``, ``plora_glb_GN``/``plora_sub_GN``) and
        Phi-3-Vision names (``[model.]vision_embed_tokens.
        img_processor.vision_model.*``, ``img_projection.{0,2}.*``,
        ``glb_GN``/``sub_GN`` — reference models/phi3v.py:120-135)."""
        vt, proj = [], {"0": {}, "2": {}}
        gn: Dict[str, np.ndarray] = {}
        for name, w in weights:
            w = np.asarray(w, np.float32)
            name = name.removeprefix("model.")
            name = name.removeprefix("vision_embed_tokens.")
            if name.startswith(("vit.", "img_processor.")):
                sub = name.split(".", 1)[1]
                sub = sub.removeprefix("vision_tower.")
                sub = sub.removeprefix("vision_model.")
                vt.append((sub, w))
            elif name.startswith(("vision_proj.", "img_projection.")):
                _, idx, kind = name.split(".")
                proj[idx][kind] = w.T if kind == "weight" else w
            elif name in ("plora_glb_GN", "glb_GN"):
                gn["glb_GN"] = w.reshape(1, -1)
            elif name in ("plora_sub_GN", "sub_GN"):
                gn["sub_GN"] = w.reshape(1, -1)
        self.params = {
            "vit": self.tower.load_weights(iter(vt)),
            "vision_proj": proj,
            **gn,
        }
        return self.params

    # -- compute --------------------------------------------------------
    def _features(self, tiles: np.ndarray) -> np.ndarray:
        """[N,3,S,S] normalized -> [N, (g/2)^2, 4C] merged features."""
        n = tiles.shape[0]
        fn = self._feat_fns.get(n)
        if fn is None:
            g, m = self.grid, self.merged

            def run(params, x):
                states = self.tower.forward(params, x)
                feats = states[self.select_layer][:, 1:]  # drop CLS
                f = feats.reshape(n, g, g, -1)
                f = f.reshape(n, m, 2, m, 2, -1).transpose(
                    0, 1, 3, 2, 4, 5).reshape(n, m * m, -1)
                return f

            fn = self._feat_fns.setdefault(n, jax.jit(run))
        return np.asarray(fn(self.params["vit"], jnp.asarray(tiles)))

    def _project(self, seq: np.ndarray) -> np.ndarray:
        t = seq.shape[0]
        fn = self._proj_fns.get(t)
        if fn is None:

            def run(p, x):
                x = jnp.dot(x, p["0"]["weight"]) + p["0"]["bias"]
                x = jax.nn.gelu(x, approximate=False)
                return jnp.dot(x, p["2"]["weight"]) + p["2"]["bias"]

            fn = self._proj_fns.setdefault(t, jax.jit(run))
        return np.asarray(fn(self.params["vision_proj"],
                             jnp.asarray(seq)))

    def num_tokens(self, h: int, w: int) -> int:
        m = self.merged
        return (h * w + 1) * m * m + 1 + (h + 1) * m

    def encode(self, image: np.ndarray,
               hd_num: Optional[int] = None) -> np.ndarray:
        """[H, W, 3] float in [0,1] (or uint8) -> [T, lm_hidden] f32."""
        assert self.params is not None, "load_weights / dummy init first"
        image = np.asarray(image)
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        sub, h, w = hd_transform(image, self.tile,
                                 hd_num or self.hd_num)
        glb = np.asarray(
            jax.image.resize(
                jnp.asarray(image, jnp.float32),
                (self.tile, self.tile, 3),
                "bicubic")).transpose(2, 0, 1)[None]
        tiles = np.concatenate([glb, sub], axis=0)
        tiles = (tiles - _MEAN[None, :, None, None]) / \
            _STD[None, :, None, None]
        feats = self._features(tiles)  # [1+h*w, m*m, 4C]

        m, c4 = self.merged, self.c4
        sub_gn = self.params["sub_GN"].reshape(1, c4)
        glb_gn = self.params["glb_GN"].reshape(1, c4)

        def with_row_gn(rows: np.ndarray) -> np.ndarray:
            """[R, cols, 4C] -> [R*(cols+1), 4C], sub_GN per row."""
            r = rows.shape[0]
            gn = np.broadcast_to(sub_gn[None], (r, 1, c4))
            return np.concatenate([rows, gn], axis=1).reshape(-1, c4)

        glb_img = with_row_gn(feats[0].reshape(m, m, c4))
        grid = feats[1:].reshape(h, w, m, m, c4).transpose(
            0, 2, 1, 3, 4).reshape(h * m, w * m, c4)
        sub_img = with_row_gn(grid)
        seq = np.concatenate([glb_img, glb_gn, sub_img], axis=0)
        assert seq.shape[0] == self.num_tokens(h, w), seq.shape
        return self._project(seq.astype(np.float32))


def splice_images(prompt_token_ids, image_embeds, *,
                  placeholder_token_id: int, marker_token_id: int
                  ) -> Dict[str, Any]:
    """Expand each marker token into an image's embedding span.

    Returns the engine input dict: token ids with each marker replaced
    by ``len(embeds_i)`` placeholder ids, plus ``multi_modal_data`` with
    the stacked ``prompt_embeds`` (zeros on text positions) and the
    image-span ``embeds_mask`` (drives both row substitution and the
    PLoRA im_mask in models/internlm_xcomposer2.py).
    """
    image_embeds = list(image_embeds)
    n_markers = sum(1 for t in prompt_token_ids
                    if t == marker_token_id)
    if n_markers != len(image_embeds):
        raise ValueError(
            f"prompt has {n_markers} image markers but "
            f"{len(image_embeds)} images were provided")
    hidden = image_embeds[0].shape[-1] if image_embeds else 0
    ids, mask, rows = [], [], []
    img_iter = iter(image_embeds)
    for t in prompt_token_ids:
        if t == marker_token_id:
            emb = next(img_iter)
            ids.extend([placeholder_token_id] * emb.shape[0])
            mask.extend([True] * emb.shape[0])
            rows.append(np.asarray(emb, np.float32))
        else:
            ids.append(t)
            mask.append(False)
            rows.append(np.zeros((1, hidden), np.float32))
    if not image_embeds:
        return {"prompt_token_ids": ids}
    return {
        "prompt_token_ids": ids,
        "multi_modal_data": {
            "prompt_embeds": np.concatenate(rows, axis=0),
            "embeds_mask": np.asarray(mask, bool),
        },
    }
