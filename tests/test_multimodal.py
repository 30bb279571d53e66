

def test_decoder_seam(spark):
    """r5 pluggable codec seam: registered decoders run end-to-end; the
    resolution order fails loud, never silently."""
    import numpy as np
    import pytest as _p

    from sparkfts.ops.multimodal import (
        FEATURE_DIM,
        _DECODERS,
        decode_features,
        register_decoder,
    )

    rows = [(1, b"\xff\xd8\xff" + b"a" * 61), (2, b"\x89PNG" + b"b" * 60)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    # no codec libs in this container: PIL never self-registers
    assert "pil" not in _DECODERS
    with _p.raises(NotImplementedError, match="register_decoder"):
        decode_features(df).collect()
    with _p.raises(ValueError, match="unknown decoder"):
        decode_features(df, decoder="nope")

    def first_bytes(payload: bytes) -> np.ndarray:
        buf = np.frombuffer(
            payload[:FEATURE_DIM].ljust(FEATURE_DIM, b"\0"), np.uint8
        )
        return buf.astype(np.float64)

    register_decoder("firstbytes", first_bytes)
    try:
        got = {r["media_id"]: r["features"]
               for r in decode_features(df, decoder="firstbytes").collect()}
        assert got[1] == [float(b) for b in rows[0][1][:FEATURE_DIM]]
        # with exactly one registered decoder, it is also the default
        auto = {r["media_id"]: r["features"]
                for r in decode_features(df).collect()}
        assert auto == got
        # explicit fake still wins over registered decoders
        fake = decode_features(df, fake=True).collect()
        assert all(len(r["features"]) == FEATURE_DIM for r in fake)

        def bad(payload: bytes) -> np.ndarray:
            return np.zeros(3)

        register_decoder("bad", bad)
        with _p.raises(Exception, match="expected"):
            decode_features(df, decoder="bad").collect()
    finally:
        _DECODERS.pop("firstbytes", None)
        _DECODERS.pop("bad", None)
