package graft.model

/** 16-bit shard id = 2-bit replica id ‖ 14-bit writer id
  * (biggraphite/accessor.py:40-63). Up to [[MaxReplicas]] replicas write
  * the same aggregates independently; a restarted writer gets a fresh
  * writer id but keeps its replica id, so rows from several writers of
  * one replica coexist and must be aggregated TOGETHER at read time
  * (replica resolution then picks the densest replica,
  * accessor.py:468-505).
  */
object Shard {
  val ReplicaMask = 0xC000
  val WriterMask = 0x3FFF
  val ReplicaShift = 14
  val ReplicaBits = 2
  val MaxReplicas: Int = 1 << ReplicaBits

  /** accessor.py:54-57 pack_shard. */
  def pack(replica: Int, writer: Int): Int =
    ((replica << ReplicaShift) | (writer & WriterMask)) & 0xFFFF

  /** accessor.py:59-63 unpack_shard → (replica, writer). */
  def unpack(shard: Int): (Int, Int) =
    ((shard & ReplicaMask) >>> ReplicaShift, shard & WriterMask)
}
