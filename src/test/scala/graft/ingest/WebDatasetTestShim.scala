package graft.ingest

/** Test access to [[WebDataset]]'s package-private member assembly and
  * archive walk (the specs byte-pin both).
  */
object WebDatasetTestShim {
  def tarMember(name: String, data: Array[Byte]): Array[Byte] =
    WebDataset.tarMember(name, data)

  def parseTar(bytes: Array[Byte])
      : Seq[(Long, Option[(String, Array[Byte])])] =
    WebDataset.parseTar(bytes)
}
