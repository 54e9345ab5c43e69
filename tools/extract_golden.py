"""Extract the golden test vectors from the reference implementation's inline
tests into tests/data/golden.npz.

The vectors (sample arrays and exact expected bitstream bytes) are normative
test data pinning the on-the-wire format (SURVEY.md §4); this script parses
them out of the reference sources so they never have to be transcribed by
hand.  Run from the repo root:  python tools/extract_golden.py
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src")
OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / "golden.npz"


def parse_numbers(text: str) -> list[int]:
    """Parse integers out of a Rust array literal body, handling simple
    forms like `-3584 + 11`, `b'x'` / `'x' as u8`, and hex."""
    text = re.sub(r"//[^\n]*", "", text)  # strip comments
    # character literals
    text = re.sub(r"b?'(.)'(?:\s*as\s*u8)?", lambda m: str(ord(m.group(1))), text)
    # identifiers like wlh/wll are handled by the caller via substitution
    out = []
    for tok in text.split(","):
        tok = tok.strip()
        if not tok:
            continue
        # allow simple addition/subtraction expressions
        tok = tok.replace(" ", "")
        m = re.fullmatch(r"(-?(?:0x[0-9a-fA-F]+|\d+))((?:[+-](?:0x[0-9a-fA-F]+|\d+))*)", tok)
        if not m:
            raise ValueError(f"cannot parse token {tok!r}")
        val = int(m.group(1), 0)
        for op in re.findall(r"[+-](?:0x[0-9a-fA-F]+|\d+)", m.group(2)):
            val += int(op, 0)
        out.append(val)
    return out


def extract_array(src: str, after: str, dtype) -> np.ndarray:
    """Find the first `&[ ... ]` or `[ ... ]` array literal after marker."""
    idx = src.index("=", src.index(after) + len(after))
    start = src.index("[", idx) + 1
    depth = 1
    end = start
    while depth:
        c = src[end]
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
        end += 1
    body = src[start : end - 1]
    return np.asarray(parse_numbers(body), dtype=dtype)


def main():
    enc = (REF / "encoder.rs").read_text()
    dec = (REF / "decoder.rs").read_text()
    crc = (REF / "crc.rs").read_text()

    data = {}

    # --- encoder.rs test_encode_frame ---
    sec = enc[enc.index("fn test_encode_frame()") : enc.index("fn test_encode_frame_zeros()")]
    wav = extract_array(sec, "let wav: &[i16]", np.int16)
    wl = len(wav)
    sec_sub = sec.replace("wlh", str((wl >> 8) & 0xFF)).replace("wll", str(wl & 0xFF))
    expected = extract_array(sec_sub, "let expected_x3_output", np.uint8)
    data["frame_wav"] = wav
    data["frame_expected"] = expected

    # --- encoder.rs test_encode_frame_zeros ---
    sec = enc[enc.index("fn test_encode_frame_zeros()") : enc.index("fn test_x3_encode_block()")]
    wav = extract_array(sec, "let wav: &[i16]", np.int16)
    wl = len(wav)
    sec_sub = sec.replace("wlh", str((wl >> 8) & 0xFF)).replace("wll", str(wl & 0xFF))
    expected = extract_array(sec_sub, "let expected_x3_output", np.uint8)
    data["zeros_wav"] = wav
    data["zeros_expected"] = expected

    # --- encoder.rs block tests ---
    for name, start_marker, end_marker in [
        ("block_rice", "fn test_x3_encode_block()", "fn test_x3_encode_block_ftype3()"),
        ("block_ftype3", "fn test_x3_encode_block_ftype3()", "fn test_x3_encode_block_bpf_eq16()"),
        ("block_bfp16", "fn test_x3_encode_block_bpf_eq16()", "fn test_x3_encode_block_bpf_lt16()"),
        ("block_bfplt16", "fn test_x3_encode_block_bpf_lt16()", "// #[test]"),
    ]:
        sec = enc[enc.index(start_marker) : enc.index(end_marker)]
        data[name + "_wav"] = extract_array(sec, "let wav: &[i16]", np.int16)
        data[name + "_expected"] = extract_array(sec, "let expected_x3_output", np.uint8)

    # --- decoder.rs block tests ---
    for name, start_marker, end_marker in [
        ("dec_ftype1", "fn test_decode_block_ftype_1()", "fn test_decode_block_ftype_2()"),
        ("dec_ftype2", "fn test_decode_block_ftype_2()", "fn test_decode_block_ftype_3()"),
        ("dec_ftype3", "fn test_decode_block_ftype_3()", "fn test_decode_block_bpf_eq16()"),
        ("dec_bfp16", "fn test_decode_block_bpf_eq16()", "fn test_decode_block_bpf_lt16()"),
        ("dec_bfplt16", "fn test_decode_block_bpf_lt16()", None),
    ]:
        sec = dec[dec.index(start_marker) : (dec.index(end_marker) if end_marker else len(dec))]
        data[name + "_input"] = extract_array(sec, "let x3_inp", np.uint8)
        data[name + "_expected"] = extract_array(sec, "let expected_wavput", np.int16)

    # --- crc.rs vectors ---
    sec = crc[crc.index("fn test_crc()") :]
    data["crc_header"] = extract_array(sec, "let header", np.uint8)
    data["crc_payload"] = extract_array(sec, "let payload", np.uint8)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} with {len(data)} arrays:")
    for k, v in sorted(data.items()):
        print(f"  {k}: shape={v.shape} dtype={v.dtype}")


if __name__ == "__main__":
    main()
