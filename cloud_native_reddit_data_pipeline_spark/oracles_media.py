"""Pinned expected outputs for the synthetic-media queries.

`operators.multimodal.synthetic_media` is a pure function of the row
index (no RNG, no sf input), so the three media queries' outputs are
byte-determined constants.  These pins were captured from one verified
run of the real stdlib codecs (functions/png.py, wav.py, y4m.py) and
serve as the DuckDB oracle: a VALUES literal the engine output must
hash-match exactly.  Any codec or feature-extraction regression goes
red against these rows (the pinned-digest tactic from
tests/test_multimodal.py, promoted to the driver's value-hash gate).

Provenance (r8, closing the self-referentiality caveat): sample pins
are CROSS-VALIDATED by independent decoders in
tests/test_multimodal.py::test_media_feature_pins_cross_validated_independently
— a manual RIFF chunk walk (no `wave` module), a zlib+struct PNG
reader, and a from-spec Y4M parser, none sharing code with
functions/{png,wav,y4m}.py, decode rows 0/1/2, match the decoded bytes
against the synthetic GENERATION formula, and recompute the pinned
feature_sum values (1.0 / 2.3366 / 10.7036) from that independently
decoded data.  A bug in the repo codecs or feature extraction can no
longer hide inside the pins.
"""

MEDIA_FEATURES_ORACLE = """
    SELECT CAST(media_id AS BIGINT) AS media_id, CAST(modality AS VARCHAR) AS modality, CAST(feature_sum AS DOUBLE) AS feature_sum, CAST(dim AS BIGINT) AS dim
    FROM (VALUES
      (0, 'image', 1.0, 16),
      (1, 'audio', 2.3366, 16),
      (2, 'video', 10.7036, 16),
      (3, 'image', 1.0, 16),
      (4, 'audio', 2.3655, 16),
      (5, 'video', 19.7036, 16),
      (6, 'image', 1.0, 16),
      (7, 'audio', 2.3436, 16),
      (8, 'video', 28.7035, 16),
      (9, 'image', 1.0, 16),
      (10, 'audio', 2.326, 16),
      (11, 'video', 37.7032, 16),
      (12, 'image', 1.0, 16),
      (13, 'audio', 2.3599, 16),
      (14, 'video', 46.7034, 16),
      (15, 'image', 1.0, 16),
      (16, 'audio', 2.3353, 16),
      (17, 'video', 55.7034, 16),
      (18, 'image', 1.0, 16),
      (19, 'audio', 2.3686, 16),
      (20, 'video', 64.7033, 16),
      (21, 'image', 1.0, 16),
      (22, 'audio', 2.3522, 16),
      (23, 'video', 73.7033, 16),
      (24, 'image', 1.0, 16),
      (25, 'audio', 2.3281, 16),
      (26, 'video', 82.7032, 16),
      (27, 'image', 1.0, 16),
      (28, 'audio', 2.3602, 16),
      (29, 'video', 91.7033, 16),
      (30, 'image', 1.0, 16),
      (31, 'audio', 2.3462, 16),
      (32, 'video', 10.7033, 16),
      (33, 'image', 1.0, 16),
      (34, 'audio', 2.3689, 16),
      (35, 'video', 19.7033, 16),
      (36, 'image', 1.0, 16),
      (37, 'audio', 2.3474, 16),
      (38, 'video', 28.7032, 16),
      (39, 'image', 1.0, 16),
      (40, 'audio', 2.3253, 16),
      (41, 'video', 37.7033, 16),
      (42, 'image', 1.0, 16),
      (43, 'audio', 2.3543, 16),
      (44, 'video', 46.7035, 16),
      (45, 'image', 1.0, 16),
      (46, 'audio', 2.3336, 16),
      (47, 'video', 55.7034, 16),
      (48, 'image', 1.0, 16),
      (49, 'audio', 2.37, 16),
      (50, 'video', 64.7034, 16),
      (51, 'image', 1.0, 16),
      (52, 'audio', 2.3476, 16),
      (53, 'video', 73.7033, 16),
      (54, 'image', 1.0, 16),
      (55, 'audio', 2.321, 16),
      (56, 'video', 82.7033, 16),
      (57, 'image', 1.0, 16),
      (58, 'audio', 2.3606, 16),
      (59, 'video', 91.7033, 16),
      (60, 'image', 1.0, 16),
      (61, 'audio', 2.3452, 16),
      (62, 'video', 10.7035, 16),
      (63, 'image', 1.0, 16)
    ) AS t(media_id, modality, feature_sum, dim)
    """

MEDIA_RESIZE_ORACLE = """
    SELECT CAST(media_id AS BIGINT) AS media_id, CAST(op AS VARCHAR) AS op, CAST(out_a AS BIGINT) AS out_a, CAST(out_b AS BIGINT) AS out_b, CAST(out_bytes AS BIGINT) AS out_bytes
    FROM (VALUES
      (0, 'resize', 32, 32, 440),
      (2, 'frame_extract', 1, 0, 450),
      (3, 'resize', 32, 32, 628),
      (5, 'frame_extract', 2, 0, 891),
      (6, 'resize', 32, 30, 735),
      (8, 'frame_extract', 2, 0, 870),
      (9, 'resize', 32, 32, 470),
      (11, 'frame_extract', 3, 0, 1367),
      (12, 'resize', 32, 30, 649),
      (14, 'frame_extract', 3, 0, 1364),
      (15, 'resize', 32, 30, 750),
      (17, 'frame_extract', 4, 0, 1775),
      (18, 'resize', 32, 32, 574),
      (20, 'frame_extract', 5, 0, 2095),
      (21, 'resize', 32, 30, 698),
      (23, 'frame_extract', 5, 0, 2303),
      (24, 'resize', 32, 32, 440),
      (26, 'frame_extract', 6, 0, 2700),
      (27, 'resize', 32, 32, 629),
      (29, 'frame_extract', 6, 0, 2675),
      (30, 'resize', 32, 30, 736),
      (32, 'frame_extract', 1, 0, 435),
      (33, 'resize', 32, 32, 470),
      (35, 'frame_extract', 2, 0, 912),
      (36, 'resize', 32, 30, 650),
      (38, 'frame_extract', 2, 0, 910),
      (39, 'resize', 32, 30, 750),
      (41, 'frame_extract', 3, 0, 1331),
      (42, 'resize', 32, 32, 575),
      (44, 'frame_extract', 3, 0, 1257),
      (45, 'resize', 32, 30, 697),
      (47, 'frame_extract', 4, 0, 1843),
      (48, 'resize', 32, 32, 440),
      (50, 'frame_extract', 5, 0, 2249),
      (51, 'resize', 32, 32, 628),
      (53, 'frame_extract', 5, 0, 2230),
      (54, 'resize', 32, 30, 735),
      (56, 'frame_extract', 6, 0, 2608),
      (57, 'resize', 32, 32, 470),
      (59, 'frame_extract', 6, 0, 2736),
      (60, 'resize', 32, 30, 650),
      (62, 'frame_extract', 1, 0, 455),
      (63, 'resize', 32, 30, 750)
    ) AS t(media_id, op, out_a, out_b, out_bytes)
    """

MEDIA_PATCHES_VAD_ORACLE = """
    SELECT CAST(media_id AS BIGINT) AS media_id, CAST(op AS VARCHAR) AS op, CAST(n_units AS BIGINT) AS n_units, CAST(mean_stat AS DOUBLE) AS mean_stat, CAST(out_bytes AS BIGINT) AS out_bytes
    FROM (VALUES
      (0, 'image_patches', 64, 124.928, 4096),
      (1, 'vad_segments', 1, 14468.4898, 40),
      (2, 'scene_changes', 5, 54.3043, 2500),
      (3, 'image_patches', 81, 124.589, 4489),
      (4, 'vad_segments', 1, 14426.6025, 60),
      (5, 'scene_changes', 11, 54.3673, 5500),
      (6, 'image_patches', 81, 124.7868, 4620),
      (7, 'vad_segments', 1, 14326.653, 40),
      (8, 'scene_changes', 17, 54.3355, 8500),
      (9, 'image_patches', 81, 124.6921, 4225),
      (10, 'vad_segments', 1, 14292.9003, 20),
      (11, 'scene_changes', 23, 54.3391, 11500),
      (12, 'image_patches', 72, 125.0742, 4352),
      (13, 'vad_segments', 1, 14539.0262, 60),
      (14, 'scene_changes', 29, 54.3447, 14500),
      (15, 'image_patches', 81, 125.0744, 4757),
      (16, 'vad_segments', 1, 14379.2615, 40),
      (17, 'scene_changes', 35, 54.3607, 17500),
      (18, 'image_patches', 81, 124.6767, 4356),
      (19, 'vad_segments', 1, 14528.4571, 60),
      (20, 'scene_changes', 41, 54.3476, 20500),
      (21, 'image_patches', 81, 125.6045, 4485),
      (22, 'vad_segments', 1, 14608.095, 40),
      (23, 'scene_changes', 47, 54.341, 23500),
      (24, 'image_patches', 64, 125.0227, 4096),
      (25, 'vad_segments', 1, 14565.4471, 20),
      (26, 'scene_changes', 53, 54.3366, 26500),
      (27, 'image_patches', 81, 124.8307, 4489),
      (28, 'vad_segments', 1, 14516.1323, 60),
      (29, 'scene_changes', 59, 54.338, 29500),
      (30, 'image_patches', 81, 125.1307, 4620),
      (31, 'vad_segments', 1, 14655.6211, 40),
      (32, 'scene_changes', 5, 54.2805, 2500),
      (33, 'image_patches', 81, 125.5041, 4225),
      (34, 'vad_segments', 1, 14469.0653, 60),
      (35, 'scene_changes', 11, 54.3273, 5500),
      (36, 'image_patches', 72, 124.8149, 4352),
      (37, 'vad_segments', 1, 14448.6007, 40),
      (38, 'scene_changes', 17, 54.3381, 8500),
      (39, 'image_patches', 81, 124.8719, 4757),
      (40, 'vad_segments', 1, 14474.9525, 20),
      (41, 'scene_changes', 23, 54.3573, 11500),
      (42, 'image_patches', 81, 124.956, 4356),
      (43, 'vad_segments', 1, 14401.9113, 60),
      (44, 'scene_changes', 29, 54.361, 14500),
      (45, 'image_patches', 81, 124.257, 4485),
      (46, 'vad_segments', 1, 14287.2272, 40),
      (47, 'scene_changes', 35, 54.3385, 17500),
      (48, 'image_patches', 64, 124.9949, 4096),
      (49, 'vad_segments', 1, 14504.0578, 60),
      (50, 'scene_changes', 41, 54.3408, 20500),
      (51, 'image_patches', 81, 125.4005, 4489),
      (52, 'vad_segments', 1, 14457.932, 40),
      (53, 'scene_changes', 47, 54.3408, 23500),
      (54, 'image_patches', 81, 125.1679, 4620),
      (55, 'vad_segments', 1, 14333.1434, 20),
      (56, 'scene_changes', 53, 54.3464, 26500),
      (57, 'image_patches', 81, 123.7498, 4225),
      (58, 'vad_segments', 1, 14555.4395, 60),
      (59, 'scene_changes', 59, 54.3424, 29500),
      (60, 'image_patches', 72, 125.1003, 4352),
      (61, 'vad_segments', 1, 14717.1381, 40),
      (62, 'scene_changes', 5, 54.4146, 2500),
      (63, 'image_patches', 81, 125.0613, 4757)
    ) AS t(media_id, op, n_units, mean_stat, out_bytes)
    """
