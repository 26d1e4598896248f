"""Engine constants.

Mirrors the reference's extraction constants (reference: config.py:1-8,
DetectUtil.py:127) translated to the text-span domain per SURVEY.md §1.2.
All thresholds participate in per-turn parity between the pure-Python
oracle (ocr_ray.oracle) and the Ray Data pipeline — change them in one
place only.
"""

# Character alphabet — exact parity with reference config.py:2-3,6.
# 94 printable chars; index 94 is the CTC blank.
CHAR_VECTOR = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "-~`<>'.:;^/|!?$%#@&*()[]{}_+=,\\\""
)
NUM_CLASSES = len(CHAR_VECTOR) + 1  # 95
BLANK_INDEX = len(CHAR_VECTOR)  # 94
CHAR_TO_INDEX = {c: i for i, c in enumerate(CHAR_VECTOR)}

# Detection thresholds — analog of DetectUtil.py:127 defaults.
SCORE_THRESH = 0.8  # unit passes proposal if score > SCORE_THRESH
BOX_THRESH = 0.1    # span survives if mean region confidence > BOX_THRESH
NMS_THRESH = 0.1    # interval-IoU threshold for locality-aware + standard NMS

# Region grouping "dilation" radius — analog of the 1x3 dilate kernel
# (DetectUtil.py:144-145): bridge across at most this many consecutive
# non-passing units when grouping passing units into a region.
DILATE_UNITS = 1

# Degenerate-span filter — analog of the <5px edge filter (test_img.py:124-125).
MIN_SPAN_LEN = 5
# Minimum content size — analog of MIN_TEXT_SIZE=10 (config.py:4): regions whose
# member units sum to fewer characters than this are masked out pre-NMS.
MIN_TEXT_SIZE = 10

# Per-turn span cap — analog of max_box_num=64 (DataGen.py:402,506), but
# deterministic: keep top-64 by (score desc, start asc) instead of sampling.
MAX_SPANS_PER_TURN = 64
# Decode window in tokens — analog of max_box_width=384 (DataGen.py:403).
MAX_DECODE_TOKENS = 384

# Parser micro-batch — analog of RECOG_BATCH=12 (config.py:7); in Ray Data
# this is just the map_batches batch_size of the parser stage, scaled up.
PARSE_BATCH_SIZE = 2048

# Payload kinds (FIXTURES.md §1 payload mix).
PAYLOAD_PLAIN = "plain"
PAYLOAD_HTML = "html"
PAYLOAD_PDFISH = "pdfish"

# Boilerplate token treated as CTC blank by the decoder, in addition to
# empty tokens (tokens whose every char is outside CHAR_VECTOR).
BLANK_TOKEN = ""

# Boilerplate separator tokens the decoder treats as CTC blanks — the
# inference-side twin of the reference's "*"/"###" ignore tags
# (DataPreprocess/DataGen.py:80-84).
DECODER_BLANKS = frozenset({"*", "###", "|", "--"})

# HTML-ish tag score table for the unit scorer (A1 analog, SURVEY §2.3).
TAG_WEIGHTS = {
    "plain": 1.0,
    "pdfline": 1.0,
    "main": 1.0,
    "article": 1.0,
    "p": 1.0,
    "h1": 1.0,
    "h2": 1.0,
    "li": 0.95,
    "div": 0.9,
    "blockquote": 0.9,
    "a": 0.3,
    "nav": 0.15,
    "header": 0.15,
    "footer": 0.15,
    "aside": 0.15,
}
DEFAULT_TAG_WEIGHT = 0.9  # unknown block tag
