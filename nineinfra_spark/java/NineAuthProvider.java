package nineinfra;

import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.security.MessageDigest;
import java.util.List;
import javax.security.sasl.AuthenticationException;
import org.apache.hive.service.auth.PasswdAuthenticationProvider;

public class NineAuthProvider implements PasswdAuthenticationProvider {
  private static final String SALT = "nineinfra";

  @Override
  public void Authenticate(String user, String password) throws AuthenticationException {
    String path = System.getProperty("nineinfra.auth.file");
    if (path == null) {
      throw new AuthenticationException("nineinfra.auth.file not set");
    }
    String want;
    try {
      MessageDigest md = MessageDigest.getInstance("MD5");
      byte[] d = md.digest((SALT + password).getBytes(StandardCharsets.UTF_8));
      StringBuilder sb = new StringBuilder();
      for (byte b : d) sb.append(String.format("%02x", b));
      want = sb.toString();
    } catch (Exception e) {
      throw new AuthenticationException("md5 unavailable", e);
    }
    try {
      List<String> lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8);
      for (String line : lines) {
        int i = line.indexOf(':');
        if (i < 0) continue;
        if (line.substring(0, i).equals(user) && line.substring(i + 1).trim().equals(want)) {
          return;
        }
      }
    } catch (Exception e) {
      throw new AuthenticationException("users file unreadable: " + path, e);
    }
    throw new AuthenticationException("invalid credentials for " + user);
  }
}
