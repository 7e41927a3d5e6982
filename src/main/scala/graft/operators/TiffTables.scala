package graft.operators

/** ITU-T T.4 modified-Huffman run-length code tables used by the TIFF
  * CCITT compressions (Compression 2 = MH-RLE, 3 = Group 3, 4 = Group
  * 4). These are the published spec tables (ITU-T Recommendation T.4,
  * tables 2/3 and the T.6 extended make-up codes); every codeword is
  * exercised and verified against libtiff-encoded run-sweep fixtures
  * in TiffSpec (src/main/resources/graft/tiff/fixture_15/16.tif).
  *
  * Encoding: (runLength, bitLength, code) with the code value held in
  * the LOW bitLength bits, transmitted MSB-first.
  */
object TiffTables {

  // --- white codes: terminating 0-63 then make-ups 64-1728 ----------
  val WhiteCodes: Array[(Int, Int, Int)] = Array(
    (0, 8, 0x35), (1, 6, 0x07), (2, 4, 0x07), (3, 4, 0x08),
    (4, 4, 0x0b), (5, 4, 0x0c), (6, 4, 0x0e), (7, 4, 0x0f),
    (8, 5, 0x13), (9, 5, 0x14), (10, 5, 0x07), (11, 5, 0x08),
    (12, 6, 0x08), (13, 6, 0x03), (14, 6, 0x34), (15, 6, 0x35),
    (16, 6, 0x2a), (17, 6, 0x2b), (18, 7, 0x27), (19, 7, 0x0c),
    (20, 7, 0x08), (21, 7, 0x17), (22, 7, 0x03), (23, 7, 0x04),
    (24, 7, 0x28), (25, 7, 0x2b), (26, 7, 0x13), (27, 7, 0x24),
    (28, 7, 0x18), (29, 8, 0x02), (30, 8, 0x03), (31, 8, 0x1a),
    (32, 8, 0x1b), (33, 8, 0x12), (34, 8, 0x13), (35, 8, 0x14),
    (36, 8, 0x15), (37, 8, 0x16), (38, 8, 0x17), (39, 8, 0x28),
    (40, 8, 0x29), (41, 8, 0x2a), (42, 8, 0x2b), (43, 8, 0x2c),
    (44, 8, 0x2d), (45, 8, 0x04), (46, 8, 0x05), (47, 8, 0x0a),
    (48, 8, 0x0b), (49, 8, 0x52), (50, 8, 0x53), (51, 8, 0x54),
    (52, 8, 0x55), (53, 8, 0x24), (54, 8, 0x25), (55, 8, 0x58),
    (56, 8, 0x59), (57, 8, 0x5a), (58, 8, 0x5b), (59, 8, 0x4a),
    (60, 8, 0x4b), (61, 8, 0x32), (62, 8, 0x33), (63, 8, 0x34),
    // make-up codes
    (64, 5, 0x1b), (128, 5, 0x12), (192, 6, 0x17), (256, 7, 0x37),
    (320, 8, 0x36), (384, 8, 0x37), (448, 8, 0x64), (512, 8, 0x65),
    (576, 8, 0x68), (640, 8, 0x67), (704, 9, 0xcc), (768, 9, 0xcd),
    (832, 9, 0xd2), (896, 9, 0xd3), (960, 9, 0xd4), (1024, 9, 0xd5),
    (1088, 9, 0xd6), (1152, 9, 0xd7), (1216, 9, 0xd8), (1280, 9, 0xd9),
    (1344, 9, 0xda), (1408, 9, 0xdb), (1472, 9, 0x98), (1536, 9, 0x99),
    (1600, 9, 0x9a), (1664, 6, 0x18), (1728, 9, 0x9b))

  // --- black codes: terminating 0-63 then make-ups 64-1728 ----------
  val BlackCodes: Array[(Int, Int, Int)] = Array(
    (0, 10, 0x37), (1, 3, 0x02), (2, 2, 0x03), (3, 2, 0x02),
    (4, 3, 0x03), (5, 4, 0x03), (6, 4, 0x02), (7, 5, 0x03),
    (8, 6, 0x05), (9, 6, 0x04), (10, 7, 0x04), (11, 7, 0x05),
    (12, 7, 0x07), (13, 8, 0x04), (14, 8, 0x07), (15, 9, 0x18),
    (16, 10, 0x17), (17, 10, 0x18), (18, 10, 0x08), (19, 11, 0x67),
    (20, 11, 0x68), (21, 11, 0x6c), (22, 11, 0x37), (23, 11, 0x28),
    (24, 11, 0x17), (25, 11, 0x18), (26, 12, 0xca), (27, 12, 0xcb),
    (28, 12, 0xcc), (29, 12, 0xcd), (30, 12, 0x68), (31, 12, 0x69),
    (32, 12, 0x6a), (33, 12, 0x6b), (34, 12, 0xd2), (35, 12, 0xd3),
    (36, 12, 0xd4), (37, 12, 0xd5), (38, 12, 0xd6), (39, 12, 0xd7),
    (40, 12, 0x6c), (41, 12, 0x6d), (42, 12, 0xda), (43, 12, 0xdb),
    (44, 12, 0x54), (45, 12, 0x55), (46, 12, 0x56), (47, 12, 0x57),
    (48, 12, 0x64), (49, 12, 0x65), (50, 12, 0x52), (51, 12, 0x53),
    (52, 12, 0x24), (53, 12, 0x37), (54, 12, 0x38), (55, 12, 0x27),
    (56, 12, 0x28), (57, 12, 0x58), (58, 12, 0x59), (59, 12, 0x2b),
    (60, 12, 0x2c), (61, 12, 0x5a), (62, 12, 0x66), (63, 12, 0x67),
    // make-up codes
    (64, 10, 0x0f), (128, 12, 0xc8), (192, 12, 0xc9), (256, 12, 0x5b),
    (320, 12, 0x33), (384, 12, 0x34), (448, 12, 0x35), (512, 13, 0x6c),
    (576, 13, 0x6d), (640, 13, 0x4a), (704, 13, 0x4b), (768, 13, 0x4c),
    (832, 13, 0x4d), (896, 13, 0x72), (960, 13, 0x73), (1024, 13, 0x74),
    (1088, 13, 0x75), (1152, 13, 0x76), (1216, 13, 0x77),
    (1280, 13, 0x52), (1344, 13, 0x53), (1408, 13, 0x54),
    (1472, 13, 0x55), (1536, 13, 0x5a), (1600, 13, 0x5b),
    (1664, 13, 0x64), (1728, 13, 0x65))

  /** Extended make-up codes 1792-2560 (shared by both colours). */
  val ExtendedCodes: Array[(Int, Int, Int)] = Array(
    (1792, 11, 0x08), (1856, 11, 0x0c), (1920, 11, 0x0d),
    (1984, 12, 0x12), (2048, 12, 0x13), (2112, 12, 0x14),
    (2176, 12, 0x15), (2240, 12, 0x16), (2304, 12, 0x17),
    (2368, 12, 0x1c), (2432, 12, 0x1d), (2496, 12, 0x1e),
    (2560, 12, 0x1f))

  /** Decode LUT: (bitLength, code) -> run length. Make-up runs are
    * stored as-is; the decoder accumulates make-ups until a
    * terminating (< 64) run arrives.
    */
  val WhiteLut: Map[(Int, Int), Int] =
    (WhiteCodes ++ ExtendedCodes).map { case (r, l, c) => (l, c) -> r }.toMap
  val BlackLut: Map[(Int, Int), Int] =
    (BlackCodes ++ ExtendedCodes).map { case (r, l, c) => (l, c) -> r }.toMap
}
