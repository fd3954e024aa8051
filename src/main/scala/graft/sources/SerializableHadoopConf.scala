package graft.sources

import org.apache.hadoop.conf.Configuration
import java.io.{ObjectInputStream, ObjectOutputStream}

/** Java-serializable Hadoop Configuration wrapper (Hadoop's own class is
  * Writable but not Serializable; Spark's internal equivalent is
  * private[spark]). Broadcast once per scan so reader factories don't
  * re-serialize ~1000 conf entries into every task closure. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
