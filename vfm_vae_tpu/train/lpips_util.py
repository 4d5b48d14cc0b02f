"""VGG16 feature-extractor layer plan for LPIPS (torchvision vgg16.features
indices; slices per reference training/lpips.py:133-147)."""

# ("conv", (cin, cout)) applies conv3x3+ReLU; ("pool", None) maxpool2;
# ("tap", None) records the current activation (the 5 LPIPS slices).
VGG16_LAYERS = [
    ("conv", (3, 64)),
    ("conv", (64, 64)),
    ("tap", None),  # relu1_2
    ("pool", None),
    ("conv", (64, 128)),
    ("conv", (128, 128)),
    ("tap", None),  # relu2_2
    ("pool", None),
    ("conv", (128, 256)),
    ("conv", (256, 256)),
    ("conv", (256, 256)),
    ("tap", None),  # relu3_3
    ("pool", None),
    ("conv", (256, 512)),
    ("conv", (512, 512)),
    ("conv", (512, 512)),
    ("tap", None),  # relu4_3
    ("pool", None),
    ("conv", (512, 512)),
    ("conv", (512, 512)),
    ("conv", (512, 512)),
    ("tap", None),  # relu5_3
]

VGG16_CFG = [cfg for kind, cfg in VGG16_LAYERS if kind == "conv"]

# torchvision vgg16.features conv indices, flattened across the 5 slices in
# the taming LPIPS module naming net.sliceK.<features_idx>.
TORCH_SLICE_CONV_KEYS = [
    "slice1.0", "slice1.2",
    "slice2.5", "slice2.7",
    "slice3.10", "slice3.12", "slice3.14",
    "slice4.17", "slice4.19", "slice4.21",
    "slice5.24", "slice5.26", "slice5.28",
]

# Plain torchvision vgg16 state-dict conv indices (features.N).
TORCHVISION_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
