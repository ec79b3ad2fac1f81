"""Typed configuration for the TPU-native UniDet3D framework.

Mirrors the experiment surface of the reference python-file config
(configs/unidet3d_1xb8_...arkitscenes.py) — per-dataset behaviour flags are
parallel lists indexed by dataset id — plus the static capacity knobs that a
TPU build needs (padding buckets replace dynamic shapes; SURVEY.md §5
"long-context" notes).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # Reference model hyper-parameters (config:29-100).
    in_channels: int = 6
    num_channels: int = 32
    voxel_size: float = 0.02
    min_spatial_shape: int = 128
    query_thr: int = 3000
    num_planes: Tuple[int, ...] = (32, 64, 96, 128, 160)
    # Decoder.
    num_layers: int = 6
    d_model: int = 256
    num_heads: int = 8
    hidden_dim: int = 1024
    dropout: float = 0.0
    activation: str = "gelu"
    # Datasets (parallel lists, config:40-43,60-62).
    datasets: Tuple[str, ...] = (
        "scannet",
        "s3dis",
        "multiscan",
        "3rscan",
        "scannetpp",
        "arkitscenes",
    )
    bbox_by_mask: Tuple[bool, ...] = (True, True, False, False, False, False)
    target_by_distance: Tuple[bool, ...] = (False, False, True, True, True, True)
    use_superpoints: Tuple[bool, ...] = (True, True, True, False, False, False)
    fast_nms: Tuple[bool, ...] = (True, False, True, True, True, True)
    angles: Tuple[bool, ...] = (False, False, False, False, False, True)
    # Criterion (config:63-94).
    datasets_weights: Tuple[float, ...] = (1.0,) * 6
    topk: Tuple[int, ...] = (6, 6, 3, 3, 3, 3)
    loss_weight: Tuple[float, float] = (0.5, 1.0)
    non_object_weight: float = 0.1
    train_topk_targets: int = 6  # train_cfg.topk for target_by_distance
    # Test cfg (config:95-100).
    low_sp_thr: float = 0.18
    up_sp_thr: float = 0.81
    topk_insts: int = 1000
    score_thr: float = 0.0
    iou_thr: Tuple[float, ...] = (0.5, 0.55, 0.55, 0.55, 0.55, 0.55)
    # Static capacities (TPU padding buckets).
    #
    # max_points covers the reference's UNCAPPED ScanNet pipelines (no
    # PointSample, ref configs/...arkitscenes.py:115-188) and S3DIS's
    # 180k cap (ref :220-221): 196608 subsumes nearly every ScanNet val
    # scan, so collate does not silently subsample at default config
    # (VERDICT r4 missing #2; telemetry still counts any outlier).
    # voxel_capacity carries ~15% headroom over the ~141k voxels a
    # 196k-point scan produces at 2 cm (real vh_clean_2 vertex spacing
    # ~2 cm -> dedup ratio ~0.7) so no voxels drop either; eval buckets
    # shrink both caps per group (data/loader.py), so only the largest
    # scenes pay for the headroom.
    max_points: int = 196608  # per scene point cap P
    voxel_capacity: int = 163840  # level-0 voxel cap PER SCENE
    max_superpoints: int = 3072  # per scene superpoint cap S
    max_gts: int = 128  # per scene GT cap G
    # Axis name for sync BN / collectives (None = single device).
    axis_name: str | None = None
    # Backbone compute dtype: 'float32' or 'bfloat16' (bf16 halves the
    # dominant HBM gather traffic; accumulation stays fp32).
    compute_dtype: str = "bfloat16"
    # Submanifold conv implementation: 'xla' (gather form) or 'pallas'
    # (two-level banded fused kernel, requires host-built BandedPack
    # rulebooks). At production capacities (131k voxels) the two-level
    # pallas kernel beats the XLA gather form end-to-end (146 vs 152 ms
    # full forward on a v5 lite chip — docs/PERF_NOTES.md); at small voxel
    # counts (32k) XLA still wins, so small-scale tools override to 'xla'.
    subm_impl: str = "pallas"
    # Pallas banded-conv SHARED GROUP windows (one DMA per dx slab of 9
    # offsets — ops/pallas_conv.py GRP). In (batch, x, y, z) sorted order
    # the center (dx=0) group's 9 offsets drift by at most a couple of
    # z-runs around the block (704 = block 512 + inter-offset spread +
    # align slack), while the dx=±1 groups jump a whole x-slab
    # (~V / n_x_slices rows; walls orthogonal to x make the tail long —
    # the residue goes to the compact miss list). Measured on the 131k
    # bench scene the grouped windows give the SAME miss counts as r3's
    # per-offset 576/1536 (misses are wsub-driven) at ~1/8 the DMA bytes.
    conv_window: int = 704  # dx=0 (y/z/center) group window
    conv_window_x: int = 1664  # dx=±1 group windows at full resolution
    # Second banding level: per-SUBGROUP (128 consecutive rows) onehot
    # widths — drift across 128 rows is far smaller than across a 512
    # block, so the dominant onehot matmul shrinks 3-4x while the window
    # DMA stays block-wide.
    conv_wsub: int = 192  # y/z/center offsets
    conv_wsub_x: int = 384  # x offsets
    # Compact out-of-band correction capacity PER SCENE, PER LEVEL (scaled
    # by the scenes per shard group at pack build; an int means uniform).
    # Misses land exclusively on the 18 x-offsets, mostly at wall/slab
    # crossings whose neighbor sits a whole x-slab away — no subwindow
    # width absorbs those (measured: widening wsub_x 384->640 cuts lvl0
    # misses only 45.7k->27.9k per 4x190k-scene group). At real-scan
    # surface density (data/synthetic.py round-5 calibration) the
    # per-scene need peaks at ~11.4k/7.6k/2.1k/0.3k/0 by level; these caps
    # give ~1.4x margin while keeping the correction's gather/scatter cost
    # (proportional to the CAP, not actual misses) close to the old
    # uniform 5x8192 total. Overflow engages the exact spill tier with a
    # warning (ops/pallas_conv.py warn_miss_overflow).
    conv_miss_cap: int | Tuple[int, ...] = (16384, 12288, 4096, 1024, 512)

    def level_miss_caps(self) -> Tuple[int, ...]:
        """Per-level per-scene miss-correction capacities."""
        mc = self.conv_miss_cap
        if isinstance(mc, int):
            return tuple(mc for _ in self.num_planes)
        assert len(mc) == len(self.num_planes), (mc, self.num_planes)
        return tuple(mc)
    # Rematerialise backbone residual blocks in the training backward
    # (trades one extra forward for activation memory). At bs8 x 65k-voxel
    # scenes the activations fit HBM without it; flip on for bigger caps.
    backbone_remat: bool = True

    @property
    def num_datasets(self) -> int:
        return len(self.datasets)

    def level_capacities(self, batch_size: int) -> Tuple[int, ...]:
        """Voxel capacity per U-Net level for a batch of `batch_size` scenes.

        voxel_capacity is PER SCENE (so capacities — and therefore pack
        shapes and dropping behaviour — scale with the local batch size,
        keeping per-shard DP packs exactly equivalent to a single flat
        batch pack); each level halves with a per-scene floor of 1024."""
        caps = [self.voxel_capacity]
        for _ in range(len(self.num_planes) - 1):
            caps.append(max(caps[-1] // 2, 1024))
        return tuple(c * batch_size for c in caps)

    def level_conv_windows(self) -> Tuple[Tuple[int, int, int], ...]:
        """Per-level (3,) pallas conv GROUP window widths (dx = -1, 0, +1
        slabs — ops/pallas_conv.py GRP), derived from PER-SCENE capacities
        (drift is a within-scene property, so windows are batch-size
        invariant and the host pack builder and the compiled kernel always
        agree). The x groups (dx = ±1) get the wide window, shrunk at
        coarse levels where slabs are short; all values 16-aligned. VMEM
        cost is 3 window buffers per conv (wx + wc + wx rows x lane tile)
        — ~1 MB at production widths, an ~8x cut from r3's 27 per-offset
        buffers."""

        def a16(v):
            return -(-v // 16) * 16

        out = []
        for cap in self.level_capacities(1):
            block = min(512, cap)
            wc = a16(max(block + 128, min(self.conv_window, a16(cap + 16))))
            wx = a16(max(wc, min(self.conv_window_x, max(cap // 16, wc))))
            out.append((wx, wc, wx))
        return tuple(out)

    def level_pack_align(self) -> Tuple[int, ...]:
        """Per-level rulebook base/sub_offs alignment = 16 * (the max
        channel-packing factor the host offsets permit at that level).

        MEASURED (scripts/bench_conv_kernel.py, v5 lite, 131k 91%-full
        scene): channel packing LOSES to the unpacked fused-output form at
        both narrow levels — C=32: pack4 4.82 vs pack1+fuse 3.91 ms; C=64:
        pack2 4.76 vs pack1+fuse 4.13 ms. The packed form's lane-mask VPU
        pass and tiled second matmul cost more than the dead-lane DMA it
        saves, and the coarser 16*p alignment forces wider subwindows
        (256/448 vs 192/384). So alignment stays 16 (pack=1) everywhere;
        the packed kernel remains available for A/B via the bench script's
        --aligns flag."""
        return tuple(16 for _ in self.num_planes)

    def level_conv_subwindows(self) -> Tuple[Tuple[int, ...], ...]:
        """Per-level (27,) subgroup onehot widths, each clamped to that
        level's window so the host rulebook and kernel stay consistent.

        Packed levels get WIDER subwindows: the coarser 16*p offset
        alignment costs up to 16*p-16 rows of drift margin, and the packed
        onehot contracts wsub/p lanes so the extra width is free in MXU
        passes (256/4=64 and 448/4=112 both fit one 128-deep pass)."""
        out = []
        aligns = self.level_pack_align()
        for lvl, w3 in enumerate(self.level_conv_windows()):
            if aligns[lvl] >= 64:
                wy, wx = max(self.conv_wsub, 256), max(self.conv_wsub_x, 448)
            elif aligns[lvl] == 32:
                wy, wx = max(self.conv_wsub, 224), self.conv_wsub_x
            else:
                wy, wx = self.conv_wsub, self.conv_wsub_x
            out.append(
                tuple(
                    min(wx if (o // 9 != 1) else wy, w3[o // 9])
                    for o in range(27)
                )
            )
        return tuple(out)


# Reference class lists (config:5-26).
CLASSES_SCANNET = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "showercurtrain", "toilet", "sink", "bathtub", "otherfurniture",
)
CLASSES_S3DIS = ("table", "chair", "sofa", "bookcase", "board")
CLASSES_MULTISCAN = (
    "door", "table", "chair", "cabinet", "window", "sofa", "microwave",
    "pillow", "tv_monitor", "curtain", "trash_can", "suitcase", "sink",
    "backpack", "bed", "refrigerator", "toilet",
)
CLASSES_3RSCAN = CLASSES_SCANNET
CLASSES_SCANNETPP = (
    "table", "door", "ceiling lamp", "cabinet", "blinds", "curtain",
    "chair", "storage cabinet", "office chair", "bookshelf", "whiteboard",
    "window", "box", "monitor", "shelf", "heater", "kitchen cabinet",
    "sofa", "bed", "trash can", "book", "plant", "blanket", "tv",
    "computer tower", "refrigerator", "jacket", "sink", "bag", "picture",
    "pillow", "towel", "suitcase", "backpack", "crate", "keyboard", "rack",
    "toilet", "printer", "poster", "painting", "microwave", "shoes",
    "socket", "bottle", "bucket", "cushion", "basket", "shoe rack",
    "telephone", "file folder", "laptop", "plant pot", "exhaust fan",
    "cup", "coat hanger", "light switch", "speaker", "table lamp",
    "kettle", "smoke detector", "container", "power strip", "slippers",
    "paper bag", "mouse", "cutting board", "toilet paper", "paper towel",
    "pot", "clock", "pan", "tap", "jar", "soap dispenser", "binder",
    "bowl", "tissue box", "whiteboard eraser", "toilet brush",
    "spray bottle", "headphones", "stapler", "marker",
)
CLASSES_ARKITSCENES = (
    "cabinet", "refrigerator", "shelf", "stove", "bed", "sink", "washer",
    "toilet", "bathtub", "oven", "dishwasher", "fireplace", "stool",
    "chair", "table", "tv_monitor", "sofa",
)

DATASETS_CLASSES = (
    CLASSES_SCANNET,
    CLASSES_S3DIS,
    CLASSES_MULTISCAN,
    CLASSES_3RSCAN,
    CLASSES_SCANNETPP,
    CLASSES_ARKITSCENES,
)


def default_config(**overrides) -> ModelConfig:
    return dataclasses.replace(ModelConfig(), **overrides)
