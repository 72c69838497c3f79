"""Real, dependency-free media codecs for the multimodal pipeline.

The container ships no imaging/audio libraries, but two production formats
are decodable with the standard library alone, so those paths are REAL —
parse the container, produce pixels/samples, compute features:

- netpbm P5 (grayscale) / P6 (RGB) binary images — the uncompressed
  interchange format every imaging tool emits (`pnmtojpeg` etc.);
- RIFF/WAVE PCM audio (8/16-bit) via the stdlib ``wave`` module.

Compressed codecs (JPEG/PNG/MP3/H.264) genuinely need external libraries
and stay behind ``NotImplementedError`` in
``promhouse_spark.operators.multimodal`` — the sniffing dispatcher there
routes each payload by magic bytes, so adding a real JPEG decoder later is
one registry entry, not a redesign.

Everything here is called from Arrow-batched ``mapInPandas`` stages only —
numpy vector math per payload, never per-pixel Python loops.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------


def _pnm_header_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; return (tokens, offset_of_raster)."""
    tokens: list[int] = []
    i = 2  # past magic
    cur = b""
    while len(tokens) < n:
        if i >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            if cur:
                tokens.append(int(cur))
                cur = b""
        else:
            if not c.isdigit():
                raise ValueError(f"bad netpbm header byte {c!r}")
            cur += c
        i += 1
    return tokens, i


def decode_pnm(payload: bytes) -> dict:
    """Decode binary netpbm: P6 → (h, w, 3) uint8, P5 → (h, w, 1) uint8.

    Real decode: header parse (comments included), raster length check,
    numpy reshape. Raises ValueError on malformed input."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not binary netpbm: magic {magic!r}")
    channels = 3 if magic == b"P6" else 1
    (width, height, maxval), off = _pnm_header_tokens(payload, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported maxval {maxval} (8-bit only)")
    need = width * height * channels
    raster = payload[off : off + need]
    if len(raster) != need:
        raise ValueError(f"raster has {len(raster)} bytes, need {need}")
    pixels = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    return {"kind": "image", "width": width, "height": height,
            "channels": channels, "maxval": maxval, "pixels": pixels}


def encode_pnm(pixels: np.ndarray, maxval: int = 255) -> bytes:
    """Inverse of decode_pnm for tests/synthesis: (h, w, 1|3) uint8 → P5/P6."""
    h, w, c = pixels.shape
    magic = b"P6" if c == 3 else b"P5"
    header = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
    return header + pixels.astype(np.uint8).tobytes()


def image_features(decoded: dict) -> list[float]:
    """8-float feature vector from decoded pixels: geometry + channel means
    + luma stats. Matches FEATURE_SCHEMA's array<float> slot."""
    px = decoded["pixels"].astype(np.float64) / float(decoded["maxval"])
    if decoded["channels"] == 3:
        means = px.mean(axis=(0, 1))  # r, g, b
        luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    else:
        m = float(px.mean())
        means = np.array([m, m, m])
        luma = px[..., 0]
    return [
        float(decoded["width"]),
        float(decoded["height"]),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(luma.mean()),
        float(luma.std()),
        float(decoded["width"]) / float(decoded["height"]),
    ]


def resize_block(decoded: dict, out_w: int, out_h: int) -> dict:
    """Real resize by area (block) averaging — the anti-aliased downscale a
    thumbnail stage wants. Pure numpy: partition source rows/cols into
    ``out_h``×``out_w`` contiguous blocks and average each."""
    px = decoded["pixels"].astype(np.float64)
    h, w, c = px.shape
    row_edges = np.linspace(0, h, out_h + 1).round().astype(int)
    col_edges = np.linspace(0, w, out_w + 1).round().astype(int)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        # clamp so every block stays a non-empty in-bounds slice even when
        # upscaling (out > in makes consecutive edges collide)
        rs = min(row_edges[i], h - 1)
        re = min(max(row_edges[i + 1], rs + 1), h)
        band = px[rs:re]
        # average rows first, then reduce column blocks via cumsum diff
        col_mean = band.mean(axis=0)
        csum = np.vstack([np.zeros((1, c)), np.cumsum(col_mean, axis=0)])
        for j in range(out_w):
            cs = min(col_edges[j], w - 1)
            ce = min(max(col_edges[j + 1], cs + 1), w)
            out[i, j] = (csum[ce] - csum[cs]) / (ce - cs)
    return {"kind": "image", "width": out_w, "height": out_h,
            "channels": c, "maxval": decoded["maxval"],
            "pixels": np.clip(out.round(), 0, 255).astype(np.uint8)}


# ---------------------------------------------------------------------------
# RIFF/WAVE PCM
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> dict:
    """Decode RIFF/WAVE PCM (8-bit unsigned / 16-bit signed) to float
    samples in [-1, 1], shape (n_frames, n_channels). Stdlib ``wave`` does
    the container parse; numpy does the PCM conversion."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sw = wf.getsampwidth()
        nch = wf.getnchannels()
        rate = wf.getframerate()
        nframes = wf.getnframes()
        raw = wf.readframes(nframes)
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw} (8/16-bit only)")
    samples = samples.reshape(-1, nch)
    return {"kind": "audio", "sample_rate": rate, "n_channels": nch,
            "n_frames": nframes, "samples": samples}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of decode_wav for tests/synthesis: float (n, ch) in [-1, 1]
    → 16-bit PCM WAV bytes."""
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(decoded: dict) -> list[float]:
    """8-float feature vector: geometry + level + spectral-ish stats
    (RMS, peak, zero-crossing rate, mean abs delta)."""
    s = decoded["samples"]
    mono = s.mean(axis=1)
    n = max(len(mono), 1)
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / n
    return [
        float(decoded["sample_rate"]),
        float(decoded["n_channels"]),
        float(decoded["n_frames"]),
        float(n / decoded["sample_rate"]) if decoded["sample_rate"] else 0.0,
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        float(np.max(np.abs(mono))) if n else 0.0,
        zc,
        float(np.mean(np.abs(np.diff(mono)))) if n > 1 else 0.0,
    ]


# ---------------------------------------------------------------------------
# YUV4MPEG2 (y4m) raw video — the uncompressed interchange format ffmpeg
# emits (`ffmpeg -i x.mp4 out.y4m`): an ASCII stream header
# "YUV4MPEG2 W<w> H<h> F<num>:<den> ... \n" followed by per-frame
# "FRAME\n" markers and raw planar YUV. Decodable with the stdlib alone,
# so the VIDEO decode path is real, like netpbm and WAV.
# ---------------------------------------------------------------------------

_Y4M_CHROMA_FACTORS = {"420": 4, "422": 2, "444": 1, "mono": 0}


def decode_y4m(payload: bytes) -> dict:
    """Parse a YUV4MPEG2 stream into per-frame LUMA planes (the Y plane is
    what features and motion estimation read; chroma is parsed for sizing
    and skipped). Returns kind/width/height/fps/n_frames plus ``frames``:
    uint8 ndarray (n_frames, height, width)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    fps_num, fps_den = 25, 1
    chroma = "420"
    for tok in payload[:nl].split()[1:]:
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            n, d = val.split(":")
            fps_num, fps_den = int(n), int(d)
        elif tag == "C":
            # tags like C420, C420jpeg, C420mpeg2, C444, Cmono
            chroma = "".join(c for c in val if c.isdigit()) or "mono"
    if not width or not height:
        raise ValueError("y4m header missing W/H")
    if chroma not in _Y4M_CHROMA_FACTORS:
        raise ValueError(f"unsupported y4m chroma subsampling C{chroma}")
    y_size = width * height
    factor = _Y4M_CHROMA_FACTORS[chroma]
    frame_size = y_size + (2 * y_size // factor if factor else 0)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        start = fnl + 1
        if start + frame_size > len(payload):
            raise ValueError("truncated y4m frame")
        y = np.frombuffer(payload[start : start + y_size], dtype=np.uint8)
        frames.append(y.reshape(height, width))
        pos = start + frame_size
    return {
        "kind": "video",
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "n_frames": len(frames),
        "frames": np.stack(frames) if frames else np.zeros((0, height, width), np.uint8),
    }


def encode_y4m(
    luma_frames: np.ndarray, fps_num: int = 25, fps_den: int = 1
) -> bytes:
    """Inverse for tests/synthesis: uint8 (n, h, w) luma → a valid C420
    stream with neutral (128) chroma planes."""
    n, h, w = luma_frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420\n".encode()
    chroma = bytes([128]) * (2 * (w // 2) * (h // 2))
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(luma_frames[i].astype(np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)


def video_features(decoded: dict) -> list[float]:
    """8-float vector: geometry + fps + luma level + inter-frame motion
    (mean absolute luma delta between consecutive frames — the classic
    cheap motion proxy)."""
    fr = decoded["frames"].astype(np.float64)
    n = decoded["n_frames"]
    fps = decoded["fps_num"] / max(decoded["fps_den"], 1)
    motion = (
        float(np.mean(np.abs(np.diff(fr, axis=0)))) if n > 1 else 0.0
    )
    return [
        float(decoded["width"]),
        float(decoded["height"]),
        float(n),
        float(fps),
        float(n / fps * 1000.0) if fps else 0.0,  # duration ms
        float(fr.mean()) if n else 0.0,
        float(fr.std()) if n else 0.0,
        motion,
    ]


# ---------------------------------------------------------------------------
# magic-byte sniffing
# ---------------------------------------------------------------------------

_COMPRESSED_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"ID3": "mp3",
    b"\xff\xfb": "mp3",
}


def sniff(payload: bytes) -> str:
    """Identify a payload by magic bytes: 'pnm' | 'wav' | a known
    compressed codec name | 'unknown'."""
    if payload[:2] in (b"P5", b"P6"):
        return "pnm"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    # ISO-BMFF: the first box is <4-byte size>"ftyp" — the size varies, so
    # match the box type, not a fixed size byte.
    if payload[4:8] == b"ftyp":
        return "mp4"
    for magic, name in _COMPRESSED_MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def decode_features(payload: bytes) -> list[float]:
    """Sniff + real decode + featurize. Raises NotImplementedError for
    compressed codecs (library required), ValueError for unknown bytes."""
    kind = sniff(payload)
    if kind == "pnm":
        return image_features(decode_pnm(payload))
    if kind == "y4m":
        return video_features(decode_y4m(payload))
    if kind == "wav":
        return audio_features(decode_wav(payload))
    if kind in ("jpeg", "png", "gif", "mp3", "mp4"):
        raise NotImplementedError(
            f"{kind} decode requires an external codec library; "
            "this container decodes netpbm and WAV natively"
        )
    raise ValueError("unrecognized payload magic")
